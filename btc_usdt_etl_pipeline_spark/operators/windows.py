"""Time-series window analytics (SURVEY.md §2A W2-W5, §2B window funcs).

Parity targets: the reference's notebook analytics
(``/root/reference/notebooks/explore_datasets.ipynb`` cells 14-16):
rolling MA/σ bands, pct-change returns, crossover signal, shifted-signal
strategy, cumulative-product equity curves — re-expressed as Spark window
functions.  All are per-key windows when ``partition_by`` is given, so they
parallelize across keys (symbols / users) at scale; a ``partition_by=None``
global series matches the reference's single-series notebook exactly.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str] | None, order_col: str) -> WindowSpec:
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    return w


def pct_change(
    col: str,
    order_col: str,
    partition_by: Sequence[str] | None = None,
    out: str = "return",
) -> Callable[[DataFrame], DataFrame]:
    """1-step fractional return: ``x/lag(x) - 1`` (notebook cell 15 W3)."""

    def _t(df: DataFrame) -> DataFrame:
        w = _window(partition_by, order_col)
        prev = F.lag(col, 1).over(w)
        return df.withColumn(out, (F.col(col) - prev) / prev)

    return _t


def rolling_mean_std(
    col: str,
    order_col: str,
    window_rows: int,
    partition_by: Sequence[str] | None = None,
    prefix: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Rolling mean + sample std over the trailing ``window_rows`` rows
    (notebook cell 14 W2: MA30 ± 2σ volatility bands)."""
    p = prefix or f"{col}_{window_rows}"

    def _t(df: DataFrame) -> DataFrame:
        w = _window(partition_by, order_col).rowsBetween(-(window_rows - 1), 0)
        return df.withColumn(f"{p}_mean", F.avg(col).over(w)).withColumn(
            f"{p}_std", F.stddev(col).over(w)
        )

    return _t


def cumulative_product(
    col: str,
    order_col: str,
    partition_by: Sequence[str] | None = None,
    out: str = "cumprod",
) -> Callable[[DataFrame], DataFrame]:
    """Running product of ``1 + col`` — equity curve (notebook cell 16 W5).

    Spark has no ``product`` window aggregate; use the standard
    exp-sum-log identity (valid for returns > -1).
    """

    def _t(df: DataFrame) -> DataFrame:
        w = _window(partition_by, order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out, F.exp(F.sum(F.log1p(F.col(col))).over(w)))

    return _t


def crossover_signal(
    fast_col: str,
    slow_col: str,
    order_col: str,
    partition_by: Sequence[str] | None = None,
    out: str = "signal",
) -> Callable[[DataFrame], DataFrame]:
    """``(fast > slow)::int`` moving-average crossover, applied with a
    1-step shift (trade on yesterday's signal — notebook cell 16 F3+W4)."""

    def _t(df: DataFrame) -> DataFrame:
        w = _window(partition_by, order_col)
        sig = F.when(F.col(fast_col) > F.col(slow_col), 1).otherwise(0)
        return df.withColumn(out, sig).withColumn(
            f"{out}_shifted", F.lag(out, 1).over(w)
        )

    return _t


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation (notebook cell 15 A2) as a long-form
    DataFrame ``(col_a, col_b, corr)`` — one aggregation pass computes all
    pairs via sum/sum-of-squares/cross-products (no per-pair jobs)."""
    # Exact decimal sums (see functions.__doc__): the correlation matrix is
    # reproducible bit-for-bit regardless of shuffle order.
    dec = "decimal(38,6)"
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).cast("double").alias(f"_s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(dec)).cast("double").alias(f"_ss_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast(dec))
                .cast("double")
                .alias(f"_sp_{a}_{b}")
            )
    stats = df.agg(*aggs)

    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n = F.col("_n")
            cov = F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}") / n
            va = F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}") / n
            vb = F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}") / n
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    (cov / F.sqrt(va * vb)).alias("corr"),
                )
            )
    return stats.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


def fill_forward(
    value_cols: Sequence[str],
    order_cols: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> "Callable[[DataFrame], DataFrame]":
    """Last-observation-carried-forward gap filling: each null takes the
    most recent non-null value in its key's series.  ``order_cols``
    should be a total order (append a unique tiebreaker) or fills at
    tied timestamps are nondeterministic.

    One window per partition key (shuffle keyed by ``partition_by`` —
    parallel across keys; for a single giant unkeyed series use the
    bucketed carry in ``operators/asof.py``, same technique).  ``last``
    with ``ignorenulls`` over an unbounded-preceding frame is
    incremental state in the window exec — no per-row rescans.
    """

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*partition_by)
            if partition_by
            else Window.partitionBy()
        )
        w = w.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = df
        for c in value_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w)
            )
        return out

    return _t
