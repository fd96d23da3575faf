"""A/B probe: the r14 scale-path reroutes vs the r13 single-sort-task
floor, on the 100x zipf events corpus (tools/gen_scale.py).

    python tools/probe_r14_floors.py [events_dir] [ops]

For each of arch_lm / variance_ratio / hurst_aggvar runs the operator on
the events table twice — ``strategy='window'`` (the r13 plan: plain
keyed ordered window, hot key on one task) and ``strategy='auto'`` (the
r14 plan: chunked-halo / bucket-index past the hot-key gate) — through
the noop sink, solo, and prints both wall times.  ``ops`` is an optional
comma list (default all three).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    events_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100x"
    )
    only = set(
        sys.argv[2].split(",") if len(sys.argv) > 2
        else [
            "arch_lm", "variance_ratio", "hurst_aggvar",
            "cusum", "kpss", "interpolate",
        ]
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("r14-floor-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.operators import windows as W
    from btc_usdt_etl_pipeline_spark.schema import normalize_event_time

    ev = normalize_event_time(
        spark.read.parquet(f"{events_dir}/events.parquet")
    )
    hot = (
        ev.groupBy("user_id").count().orderBy("count", ascending=False)
        .first()
    )
    print(f"rows={ev.count()} hot_user={hot['user_id']} n={hot['count']}")
    # Warm-up (guide §1): one full scan + one keyed window job so the
    # first timed config does not absorb codegen/JIT/page-cache
    # ramp-up — the raw first-run numbers were inflated 2-10×.
    spark.sparkContext.setJobDescription("warmup")
    ev.write.mode("overwrite").format("noop").save()
    from pyspark.sql import Window

    ev.withColumn(
        "_w",
        F.lag("value").over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        ),
    ).write.mode("overwrite").format("noop").save()
    spark.sparkContext.setJobDescription(None)

    def run(tag, fn):
        best = None
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{tag} run{i}")
            t0 = time.time()
            ev.transform(fn).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best:.1f}s", flush=True)
        return best

    def _interp(s):
        def _f(df):
            masked = df.select(
                "user_id", "ts", "event_id",
                df.ts.cast("timestamp").cast("double").alias("_tsec"),
                F.when(df.event_id % 7 == 3, None)
                .otherwise(df.value)
                .alias("v"),
            )
            return masked.transform(
                W.interpolate_linear(
                    "v", "_tsec", partition_by=["user_id"],
                    order_by=("ts", "event_id"), out="filled",
                    strategy=s,
                )
            )

        return _f

    mk = {
        "arch_lm": lambda s: W.arch_lm(
            "value", partition_by="user_id",
            order_by=("ts", "event_id"), strategy=s,
        ),
        "variance_ratio": lambda s: W.variance_ratio(
            "value", 4, partition_by="user_id",
            order_by=("ts", "event_id"), strategy=s,
        ),
        "hurst_aggvar": lambda s: W.hurst_aggvar(
            "value", (2, 4, 8), partition_by="user_id",
            order_by=("ts", "event_id"), strategy=s,
        ),
        "cusum": lambda s: W.cusum(
            "value", target=100.0, slack=10.0, threshold=1000.0,
            partition_by="user_id", order_by=("ts", "event_id"),
            strategy=s,
        ),
        "kpss": lambda s: W.kpss_level(
            "value", bartlett_lags=5, partition_by="user_id",
            order_by=("ts", "event_id"), strategy=s,
        ),
    }
    mk["interpolate"] = _interp
    for name, f in mk.items():
        if name not in only:
            continue
        for s in ("window", "auto"):
            run(f"{name}[{s}]", f(s))
    return 0


if __name__ == "__main__":
    sys.exit(main())
