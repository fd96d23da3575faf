"""SparkSession construction tuned for scale.

The reference builds a bare 4g/4g local session
(``/root/reference/components/process_data.py:19-25``). We instead enable
AQE (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for the Pandas-UDF paths, and a UTC session timezone so that
date/time functions are deterministic and oracle-comparable.

On a real cluster the same builder is used with ``master`` unset (taken
from spark-submit) — nothing here is local-mode specific except the
default master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "btc-usdt-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime partition coalescing + skew-join handling means the
      static ``shuffle.partitions`` only needs to be an upper bound.
    - Arrow on: every Pandas-UDF / ``mapInPandas`` operator transfers
      columnar batches instead of pickled rows.
    - UTC session timezone: epoch→timestamp conversions and date_trunc are
      independent of the host timezone (oracle reproducibility).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Sketch-style operators (minhash signatures, simhash votes) carry
        # 100+ agg columns per row; the default codegen.maxFields=100
        # silently drops whole-stage codegen for exactly those plans —
        # a 10-30x slowdown on the hottest path.
        .config("spark.sql.codegen.maxFields", "1024")
        # Broadcast anything under 32 MB — every dim table in the star
        # schema (region/nation/customer/supplier/part) qualifies.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when the planner's size
        # conditions hold (build side < broadcastThreshold ×
        # shuffle.partitions AND ≥3× smaller than the probe side): skips
        # both sort passes.  Measured r14 A/B (tools/probe_shj_ab2.py —
        # within-session, order alternated per round, warm-up discarded;
        # the earlier probe_shj_ab.py run overstated the win via a fixed
        # smj-before-shj order): repeatable wins exactly where a
        # conversion happens (q119 0.88x, q83 0.92x, q178 0.93x), the
        # other 7 SMJ-heavy queries unchanged plans, ±7% session noise.
        # The AQE threshold additionally converts SMJ→SHJ at runtime
        # when every MEASURED post-shuffle partition is ≤64 MB — the
        # size-bounded path that stays safe when static estimates are
        # wrong at scale (spill-less build ≤64 MB/partition by
        # construction); AQE skew-join splitting above remains on and
        # applies to SHJ too.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
