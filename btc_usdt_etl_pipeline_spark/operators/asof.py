"""As-of (most-recent-prior) join — aligning two time series.

Spark has no native ASOF JOIN; the declared implementation (SURVEY.md §2B
joins row, §4.3 "library op") is the union + last-observation-carried-forward
window: tag both sides, union by time, and for each left row take the last
right value at-or-before its timestamp via an ignore-nulls ``last`` window.

Shuffles once by (keys, time) — parallel across keys.  With no keys the
window is global; for a single giant series, pre-bucket by coarse time and
carry the last value per bucket (same offsets technique as
``resample.with_global_index``) — not needed for keyed data, which is the
100 TB case (one series per symbol/user).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    right_time_col: str | None = None,
    by: Sequence[str] = (),
    right_value_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` (direction='backward'; DuckDB ``ASOF JOIN``
    semantics).  ``tolerance`` (same unit as the time column) drops matches
    older than ``left.time - tolerance``.

    Returns all left columns plus ``right_value_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"
    rt = right_time_col or time_col
    value_cols = list(
        right_value_cols
        if right_value_cols is not None
        else [c for c in right.columns if c != rt and c not in by]
    )

    # Tie ordering makes the inclusive bound work in both directions: a
    # right row at exactly left.time must fall INSIDE the left row's
    # frame — before it (backward frame ends at current) or after it
    # (forward frame starts at current).
    left_ord, right_ord = (1, 0) if backward else (0, 1)
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_t", F.col(time_col)
    ).withColumn("_ord", F.lit(left_ord))
    rhs = (
        right.select(
            *by, F.col(rt).alias("_t"), *[F.col(c) for c in value_cols]
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_ord", F.lit(right_ord))
    )

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    base_w = (
        Window.partitionBy(*by).orderBy("_t", "_ord")
        if by
        else Window.orderBy("_t", "_ord")
    )
    if backward:
        w = base_w.rowsBetween(Window.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = base_w.rowsBetween(0, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    carried = unioned
    for c in value_cols:
        src = F.when(F.col("_side") == 0, F.col(c))
        carried = carried.withColumn(c, pick(src).over(w))
    if tolerance is not None:
        rt_carried = pick(
            F.when(F.col("_side") == 0, F.col("_t"))
        ).over(w)
        carried = carried.withColumn("_rt", rt_carried)
        in_tol = (
            F.col("_rt") >= F.col("_t") - F.lit(tolerance)
            if backward
            else F.col("_rt") <= F.col("_t") + F.lit(tolerance)
        )
        for c in value_cols:
            carried = carried.withColumn(c, F.when(in_tol, F.col(c)))
        carried = carried.drop("_rt")
    return carried.filter(F.col("_side") == 1).drop("_side", "_t", "_ord")
