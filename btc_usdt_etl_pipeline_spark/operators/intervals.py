"""Interval algebra: merge overlapping spans, coverage, gap detection.

The classic "flatten overlapping intervals" operator (union of a set of
[start, end] spans per key) that backs session coverage, on-call
scheduling, sensor-uptime and meeting-room queries — and, in a training
pipeline, collapsing per-shard time ranges into contiguous ingestion
windows.  The reference's sessionize/funnel composites group by gap;
this is the dual: group by *overlap*.

Scale shape: one hash shuffle on the key, then two keyed window passes
(running max of ``end`` to detect chain breaks, running sum of the
break flag to number the chains) and one keyed aggregation — no
self-join, no explode, O(n log n_partition) per key.  The naive
interval-overlap self-join is Σ per-key n² and is exactly what this
avoids.  All expressions are JVM/codegen; works identically on integer
or timestamp-as-epoch spans.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    order_tiebreak: Sequence[str] = (),
    merge_touching: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """Collapse overlapping (and, by default, touching) intervals per key.

    Returns one row per merged span: the key columns plus
    ``span_start`` / ``span_end`` (min start / max end of the chain) and
    ``n_intervals`` (how many source rows the span absorbed).

    Algorithm (the textbook sweep, expressed as keyed windows):

    1. order intervals by (start, end) within each key;
    2. a row STARTS a new span iff its start exceeds the running max of
       all previous ends (``>`` when touching spans merge, ``>=`` when
       they don't) — running max, not ``lag(end)``, because an earlier
       long interval can swallow a later short one;
    3. the cumulative sum of that break flag numbers the spans; one
       keyed agg emits them.

    ``order_tiebreak`` adds deterministic ordering columns after
    (start, end); the merged OUTPUT is order-independent either way (the
    running max is insensitive to tie order), it only pins the window
    sort for plan reproducibility.
    """
    keys = list(key_cols)

    def _t(df: DataFrame) -> DataFrame:
        order = [F.col(start_col), F.col(end_col)] + [
            F.col(c) for c in order_tiebreak
        ]
        w_prev = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        prev_max_end = F.max(F.col(end_col)).over(w_prev)
        if merge_touching:
            breaks = F.col(start_col) > prev_max_end
        else:
            breaks = F.col(start_col) >= prev_max_end
        flag = F.when(
            F.coalesce(breaks, F.lit(True)), F.lit(1)
        ).otherwise(F.lit(0))
        return (
            df.withColumn("_span_id", F.sum(flag).over(w_run))
            .groupBy(*keys, "_span_id")
            .agg(
                F.min(start_col).alias("span_start"),
                F.max(end_col).alias("span_end"),
                F.count(F.lit(1)).alias("n_intervals"),
            )
            .drop("_span_id")
        )

    return _t


def interval_coverage(
    key_cols: Sequence[str], start_col: str, end_col: str
) -> Callable[[DataFrame], DataFrame]:
    """Total covered length and span/interval counts per key.

    ``covered`` is the measure of the UNION of the key's intervals
    (double-counted overlap removed) — the uptime / busy-time number a
    raw ``sum(end - start)`` gets wrong whenever spans overlap.
    Integer-typed spans stay integer (epoch seconds in, seconds out).
    """
    keys = list(key_cols)

    def _t(df: DataFrame) -> DataFrame:
        merged = df.transform(
            merge_intervals(keys, start_col, end_col)
        )
        return merged.groupBy(*keys).agg(
            F.sum(
                F.col("span_end") - F.col("span_start")
            ).alias("covered"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("n_intervals").alias("n_intervals"),
        )

    return _t


def interval_gaps(
    key_cols: Sequence[str], start_col: str, end_col: str
) -> Callable[[DataFrame], DataFrame]:
    """Uncovered gaps between a key's merged spans (the complement).

    One extra keyed window (lead of ``span_start``) over the merged
    output; emits ``gap_start`` / ``gap_end`` rows strictly between
    consecutive spans.  Keys with a single span produce no rows.
    """
    keys = list(key_cols)

    def _t(df: DataFrame) -> DataFrame:
        merged = df.transform(
            merge_intervals(keys, start_col, end_col)
        )
        w = Window.partitionBy(*keys).orderBy("span_start")
        nxt = F.lead("span_start").over(w)
        return (
            merged.select(
                *keys,
                F.col("span_end").alias("gap_start"),
                nxt.alias("gap_end"),
            )
            .where(F.col("gap_end").isNotNull())
            .where(F.col("gap_end") > F.col("gap_start"))
        )

    return _t
