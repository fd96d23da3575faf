"""Physical data-layout operators: zone-map pruning and compaction.

At 100 TB the dominant cost of most queries is the SCAN, and the two
levers a table maintainer has are (a) clustering so file-level min/max
statistics (zone maps / parquet footers / the Delta log) prune scans,
and (b) compacting small files so the scan doesn't drown in per-file
overhead.  The clustering KEY already exists
(`operators/partitioning.py:zorder_key`); this module adds what a
layout optimizer needs around it: the per-file statistics view, the
planner-side pruning evaluation that quantifies a layout's win, and the
small-file compaction planner.  All three are metadata-sized
aggregations — one groupBy over the file assignment, then arithmetic
over rows == number-of-files — so they cost the same at sf0.01 and at
100 TB (file counts grow ~linearly but stay millions, not trillions).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skipping_stats(
    file_col: str, stat_cols: Sequence[str]
) -> Callable[[DataFrame], DataFrame]:
    """Per-file min/max statistics — the parquet-footer / Delta-log view.

    One aggregation keyed by the file id; the output has one row per
    file, which is what makes planner-side pruning against it
    effectively free at any data scale.  On a real table this frame
    comes from the transaction log for free; computing it in-plan here
    lets a PROPOSED layout be evaluated before any rewrite happens.
    """

    def _t(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)

    return _t


def files_scanned(
    stats: DataFrame, predicates: Mapping[str, tuple[float, float]]
) -> DataFrame:
    """Evaluate zone-map pruning for a conjunctive range predicate.

    ``predicates`` maps column name -> (lo, hi) inclusive.  A file must
    be scanned iff every per-column [min, max] interval overlaps the
    query's [lo, hi] — the standard zone-map test (false positives
    possible, false negatives never, so pruning is always sound).
    Returns one row: files scanned / total and rows scanned / total —
    the before/after evidence for a layout choice.
    """
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = (
            cond
            & (F.col(f"min_{c}") <= F.lit(hi))
            & (F.col(f"max_{c}") >= F.lit(lo))
        )
    return stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(cond.cast("long")).alias("files_scanned"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(
            F.when(cond, F.col("n_rows")).otherwise(F.lit(0))
        ).alias("rows_scanned"),
    )


def compaction_plan(
    partition_cols: Sequence[str],
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> Callable[[DataFrame], DataFrame]:
    """Group small files into compaction bins of ~``target_bytes``.

    Input: one row per file (partition columns, file id, size).  Files
    are packed in file-id order by the running-sum rule — a file joins
    bin ``floor(cumulative_size_before_it / target)`` within its
    partition — so every closed bin lands within one max-file-size of
    the target (total ∈ (target − max_file, target + max_file]), and
    the assignment is a single keyed window (one shuffle on the
    partition key), fully deterministic and order-stable.  First-fit-
    decreasing packs tighter in the worst case but is inherently
    sequential AND shuffles files arbitrarily; the running-sum rule is
    what log-structured compactors (Delta OPTIMIZE binpack, Iceberg
    rewrite_data_files) actually do — coalesce ADJACENT files,
    preserving whatever clustering order the table already has.

    Output: one row per (partition, bin) with file count, total bytes
    and the file-id range — metadata-sized, ready to drive the rewrite
    job's ``coalesce`` groups.
    """
    parts = list(partition_cols)

    def _t(files: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*parts)
            .orderBy(file_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = F.coalesce(
            F.sum(size_col).over(w), F.lit(0).cast("long")
        )
        return (
            files.withColumn(
                "bin",
                F.floor(before / F.lit(target_bytes)).cast("long"),
            )
            .groupBy(*parts, "bin")
            .agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum(size_col).alias("total_bytes"),
                F.min(file_col).alias("first_file"),
                F.max(file_col).alias("last_file"),
            )
        )

    return _t
