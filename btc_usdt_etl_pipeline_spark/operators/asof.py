"""As-of (most-recent-prior) join — aligning two time series.

Spark has no native ASOF JOIN; the declared implementation (SURVEY.md §2B
joins row, §4.3 "library op") is the union + last-observation-carried-forward
window: tag both sides, union by time, and for each left row take the last
right value at-or-before its timestamp via an ignore-nulls ``last`` window.

Keyed (``by`` non-empty): shuffles once by (keys, time) — parallel across
keys, the 100 TB case (one series per symbol/user).

Unkeyed: a global row-ordered window would serialize the whole series onto
one task, so the unkeyed path instead runs a two-level bucket carry:

1. Bucket both sides by a coarse key monotone in time (calendar day for
   timestamps; range-balanced fixed width for numerics).
2. One aggregation: per bucket, the last (first, for forward) non-null
   right value per column.  #buckets rows — metadata scale.
3. A bucket-level carry window (global, but over #buckets rows only)
   computes each bucket's carry-in: the last value from any PRIOR bucket.
4. Broadcast the carry-ins back; the per-row window is then partitioned by
   bucket — parallel across buckets — and falls back to the carry-in when
   the bucket has no prior right row.

Same output as the single-window plan (property-tested both directions);
no data-sized single-partition stage anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_col(
    df: DataFrame,
    col: str,
    num_buckets: int = 512,
    bucket_width: int | None = None,
) -> F.Column:
    """Coarse bucket key, monotone in ``col``.

    Timestamps: fixed one-day buckets (no pre-pass).  Numerics with an
    explicit ``bucket_width``: pure arithmetic, no pre-pass.  Numerics
    without: one min/max aggregation to range-balance ``num_buckets``
    fixed-width buckets — an EAGER job fired at plan-construction time,
    so callers who know their time-axis density should pass the width
    (at 100 TB the probe is a full-column scan spent deciding how to
    spend the real job).
    """
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        # .cast("timestamp"): TIMESTAMP_NTZ inputs (raw parquet scans)
        # are rejected by unix_micros; the constant session-TZ shift
        # preserves the monotonicity bucketing needs.
        return F.floor(
            F.unix_micros(F.col(col).cast("timestamp"))
            / F.lit(86_400_000_000)
        ).cast("long")
    if dtype == "date":
        return F.floor(
            F.datediff(F.col(col), F.lit("1970-01-01").cast("date"))
            / F.lit(32)
        ).cast("long")
    if bucket_width is not None:
        if bucket_width <= 0:
            raise ValueError("bucket_width must be positive")
        return F.floor(F.col(col) / F.lit(int(bucket_width))).cast("long")
    row = df.select(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return F.lit(0).cast("long")
    span = max(int(hi) - int(lo), 0) + 1
    width = max(span // num_buckets, 1)
    return F.floor((F.col(col) - F.lit(int(lo))) / F.lit(width)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    right_time_col: str | None = None,
    by: Sequence[str] = (),
    right_value_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
    bucket_width: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` (direction='backward'; DuckDB ``ASOF JOIN``
    semantics).  ``tolerance`` (same unit as the time column) drops matches
    older than ``left.time - tolerance``.  ``bucket_width`` (unkeyed
    numeric time axes only): bucket span for the two-level carry — passing
    it keeps plan construction job-free; when absent the operator
    range-balances via an eager min/max probe.

    Returns all left columns plus ``right_value_cols``.  Raises
    ``ValueError`` if a right value column collides with a left column (the
    silent-overwrite alternative corrupts output) or if reserved temporary
    names (``_side``/``_t``/``_ord``/``_bkt``/``_cin_*``) are taken.
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

    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left "
            "columns; rename them or pass right_value_cols explicitly"
        )
    reserved = {"_side", "_t", "_ord", "_bkt", "_cin_rt"} | {
        f"_cin_{c}" for c in value_cols
    }
    taken = reserved & (set(left.columns) | set(value_cols) | set(by))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with asof_join temporaries"
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

    # BOTH directions run as `last(ignorenulls)` over a GROWING
    # (unbounded-preceding) frame — the forward direction simply orders
    # DESCENDING.  The natural forward formulation, `first(ignorenulls)
    # OVER (CURRENT ROW .. UNBOUNDED FOLLOWING)`, is O(n²) per
    # partition in Spark's window exec (shrinking frames re-scan the
    # remaining rows for every row) — the same measured hang class as
    # interpolate_linear's backward pass (SCALE.md §8, q220 note);
    # growing frames evaluate incrementally in O(n).
    frame = (Window.unboundedPreceding, 0)
    pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    if backward:
        ocols = [F.col("_t").asc(), F.col("_ord").asc()]
    else:
        ocols = [F.col("_t").desc(), F.col("_ord").desc()]

    def _right(c: F.Column) -> F.Column:
        return F.when(F.col("_side") == 0, c)

    if by:
        w = Window.partitionBy(*by).orderBy(*ocols).rowsBetween(*frame)
        carried = unioned
        for c in value_cols:
            carried = carried.withColumn(c, pick(_right(F.col(c))).over(w))
        rt_carried = pick(_right(F.col("_t"))).over(w)
    else:
        # Unkeyed: bucketed carry (module docstring).  The unioned
        # subtree feeds two branches (bucket stats + main); the stats
        # branch recomputes it column-pruned rather than persisting —
        # a persist here could never be released (the returned plan
        # stays lazy), and the bucket-stats recompute prunes to the
        # time/value columns anyway.
        u = unioned.withColumn(
            "_bkt", _bucket_col(unioned, "_t", bucket_width=bucket_width)
        )
        # Per bucket: last (first) non-null right value per column.  A
        # null ordering key makes max_by/min_by skip the row, giving
        # per-column ignore-null semantics that mirror the window path.
        pickb = F.max_by if backward else F.min_by
        aggs = [
            pickb(
                F.col(c), _right(F.when(F.col(c).isNotNull(), F.col("_t")))
            ).alias(f"_cin_{c}")
            for c in value_cols
        ]
        last_rt = F.max if backward else F.min
        aggs.append(last_rt(_right(F.col("_t"))).alias("_cin_rt"))
        bstats = u.groupBy("_bkt").agg(*aggs)
        # Bucket-level carry-in: value from any prior (later, for forward)
        # bucket.  Global window, but over #buckets rows — metadata
        # scale.  Forward uses the same DESC-order growing-frame trick
        # as the row-level windows (O(#buckets), not O(#buckets²)).
        if backward:
            cw = Window.orderBy(F.col("_bkt").asc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        else:
            cw = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        carry = bstats.select(
            "_bkt",
            *[
                pick(F.col(f"_cin_{c}")).over(cw).alias(f"_cin_{c}")
                for c in value_cols
            ],
            pick(F.col("_cin_rt")).over(cw).alias("_cin_rt"),
        )
        u = u.join(F.broadcast(carry), "_bkt")
        w = (
            Window.partitionBy("_bkt")
            .orderBy(*ocols)
            .rowsBetween(*frame)
        )
        carried = u
        for c in value_cols:
            carried = carried.withColumn(
                c,
                F.coalesce(
                    pick(_right(F.col(c))).over(w), F.col(f"_cin_{c}")
                ),
            )
        rt_carried = F.coalesce(
            pick(_right(F.col("_t"))).over(w), F.col("_cin_rt")
        )

    if tolerance is not None:
        carried = carried.withColumn("_rt", rt_carried)
        in_tol = (
            F.col("_rt") >= F.col("_t") - F.lit(tolerance)
            if backward
            else F.col("_rt") <= F.col("_t") + F.lit(tolerance)
        )
        for c in value_cols:
            carried = carried.withColumn(c, F.when(in_tol, F.col(c)))
        carried = carried.drop("_rt")
    drop_cols = ["_side", "_t", "_ord"]
    if not by:
        drop_cols += ["_bkt", "_cin_rt"] + [f"_cin_{c}" for c in value_cols]
    return carried.filter(F.col("_side") == 1).drop(*drop_cols)
