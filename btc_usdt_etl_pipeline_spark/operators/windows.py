"""Time-series window analytics (SURVEY.md §2A W2-W5, §2B window funcs).

Parity targets: the reference's notebook analytics
(``/root/reference/notebooks/explore_datasets.ipynb`` cells 14-16):
rolling MA/σ bands, pct-change returns, crossover signal, shifted-signal
strategy, cumulative-product equity curves — re-expressed as Spark window
functions.  All are per-key windows when ``partition_by`` is given, so they
parallelize across keys (symbols / users) at scale; a ``partition_by=None``
global series matches the reference's single-series notebook exactly.

Unkeyed scale path (round 7): an unkeyed ``Window.orderBy`` serializes
the whole series onto one task.  For the BOUNDED trailing frames here
(``pct_change`` lag-1, ``rolling_mean_std`` W rows) an exact parallel
decomposition exists: dense global index (the two-pass bucket-offset
pass from ``operators/resample.py`` — no global sort), fixed-size
chunks, the last ``halo`` rows of each chunk duplicated into the next
chunk as read-only context, per-chunk windows (parallel across chunks),
halo outputs dropped.  Every output row's frame then contains exactly
the same rows in the same order as the single-window plan, so results
are BIT-IDENTICAL — which is why ``strategy='auto'`` can swap plans on
Catalyst's size estimate without changing any oracle hash.
``fill_forward``'s unbounded carry uses the bucket-level carry-in
decomposition instead (same technique as the unkeyed as-of join in
``operators/asof.py``).  ``cumulative_product`` has NO bit-identical
parallel form (re-associating the log-sum changes IEEE rounding), so it
keeps the honest single-series window; see SCALE.md §8 for the measured
single-task ceiling and the keyed escape hatch.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

#: Unkeyed series larger than this (Catalyst plan-stats estimate, no
#: scan) switch to the chunked/bucketed parallel plan.  NOT resample's
#: 1.5 GB sort threshold: a window op's single-task cost is the sort
#: PLUS an O(n·frame) window evaluation, so the crossover sits far
#: lower.  Measured (local[32], rolling W=30): 1M rows / 13 MB plan —
#: window 2.4 s vs chunked 3.0 s; 10M rows / 134 MB — window 41.3 s vs
#: chunked 11.7 s (3.5×).  32 MB ≈ the ~2M-row crossover.
_CHUNK_THRESHOLD_BYTES = 32_000_000
_CHUNK_ROWS = 1 << 20


def _window(partition_by: Sequence[str] | None, order_col: str) -> WindowSpec:
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    return w


def _plan_size(df: DataFrame) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def _auto_chunked(df: DataFrame, order_col: str, strategy: str) -> bool:
    """Decide the unkeyed plan: explicit strategy wins; ``auto`` goes
    chunked past the size threshold — but only when the order column's
    type supports arithmetic auto-bucketing (timestamp/date/numeric);
    anything else keeps the single-window plan rather than erroring."""
    if strategy == "window":
        return False
    if strategy == "chunked":
        return True
    dtype = dict(df.dtypes)[order_col]
    bucketable = (
        dtype.startswith("timestamp")
        or dtype == "date"
        or dtype in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or dtype.startswith("decimal")
    )
    return bucketable and _plan_size(df) > _CHUNK_THRESHOLD_BYTES


def _chunked_trailing(
    df: DataFrame,
    order_col: str,
    halo: int,
    compute: Callable[[DataFrame, WindowSpec], DataFrame],
    chunk_rows: int | None = None,
) -> DataFrame:
    """Exact unkeyed trailing-frame windows without a single-partition
    sort.  ``compute(df, w)`` must add columns using window specs
    derived from ``w`` with frames reaching at most ``halo`` rows back.
    """
    from btc_usdt_etl_pipeline_spark.operators.resample import (
        with_global_index,
    )

    # Late-bound module global so tests can shrink chunks to force
    # multi-chunk coverage on small inputs.
    chunk_rows = max(chunk_rows or _CHUNK_ROWS, 4 * halo, 1)
    indexed = with_global_index(df, order_col, index_col="_g_idx")
    chunk = F.floor(F.col("_g_idx") / F.lit(chunk_rows))
    base = indexed.withColumn("_chunk", chunk).withColumn(
        "_halo", F.lit(False)
    )
    halo_rows = (
        indexed.filter(
            (F.col("_g_idx") % chunk_rows) >= F.lit(chunk_rows - halo)
        )
        .withColumn("_chunk", chunk + 1)
        .withColumn("_halo", F.lit(True))
    )
    u = base.unionByName(halo_rows)
    w = Window.partitionBy("_chunk").orderBy("_g_idx")
    out = compute(u, w)
    return out.filter(~F.col("_halo")).drop("_chunk", "_halo", "_g_idx")


def pct_change(
    col: str,
    order_col: str,
    partition_by: Sequence[str] | None = None,
    out: str = "return",
    strategy: str = "auto",
) -> Callable[[DataFrame], DataFrame]:
    """1-step fractional return: ``x/lag(x) - 1`` (notebook cell 15 W3).

    Unkeyed ``strategy``: ``'window'`` = single global window,
    ``'chunked'`` = halo-chunked parallel plan (bit-identical output),
    ``'auto'`` = switch on Catalyst's size estimate.
    """
    if strategy not in ("auto", "window", "chunked"):
        raise ValueError("strategy must be auto | window | chunked")

    def _ret(prev: Column) -> Column:
        return (F.col(col) - prev) / prev

    def _t(df: DataFrame) -> DataFrame:
        if not partition_by and _auto_chunked(df, order_col, strategy):
            return _chunked_trailing(
                df,
                order_col,
                halo=1,
                compute=lambda u, w: u.withColumn(
                    out, _ret(F.lag(col, 1).over(w))
                ),
            )
        w = _window(partition_by, order_col)
        return df.withColumn(out, _ret(F.lag(col, 1).over(w)))

    return _t


def rolling_mean_std(
    col: str,
    order_col: str,
    window_rows: int,
    partition_by: Sequence[str] | None = None,
    prefix: str | None = None,
    strategy: str = "auto",
) -> Callable[[DataFrame], DataFrame]:
    """Rolling mean + sample std over the trailing ``window_rows`` rows
    (notebook cell 14 W2: MA30 ± 2σ volatility bands).

    Unkeyed ``strategy`` as in :func:`pct_change`: the chunked plan
    carries ``window_rows - 1`` halo rows per chunk boundary and is
    bit-identical to the single-window plan.
    """
    if strategy not in ("auto", "window", "chunked"):
        raise ValueError("strategy must be auto | window | chunked")
    p = prefix or f"{col}_{window_rows}"

    def _add(u: DataFrame, w: WindowSpec) -> DataFrame:
        f = w.rowsBetween(-(window_rows - 1), 0)
        return u.withColumn(f"{p}_mean", F.avg(col).over(f)).withColumn(
            f"{p}_std", F.stddev(col).over(f)
        )

    def _t(df: DataFrame) -> DataFrame:
        if not partition_by and _auto_chunked(df, order_col, strategy):
            return _chunked_trailing(
                df, order_col, halo=window_rows - 1, compute=_add
            )
        return _add(df, _window(partition_by, order_col))

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
    strategy: str = "auto",
) -> "Callable[[DataFrame], DataFrame]":
    """Last-observation-carried-forward gap filling: each null takes the
    most recent non-null value in its key's series.  ``order_cols``
    should be a total order (append a unique tiebreaker) or fills at
    tied timestamps are nondeterministic.

    One window per partition key (shuffle keyed by ``partition_by`` —
    parallel across keys).  ``last`` with ``ignorenulls`` over an
    unbounded-preceding frame is incremental state in the window exec —
    no per-row rescans.

    Unkeyed scale path (``strategy``: ``'window'`` | ``'bucket'`` |
    ``'auto'`` on Catalyst's size estimate): the unbounded carry
    decomposes as in the unkeyed as-of join (``operators/asof.py``) —
    bucket by a coarse key monotone in ``order_cols[0]`` (ties on the
    first order column always share a bucket, so cross-bucket order is
    total even when later tie-breakers reorder within it), one
    aggregation takes each bucket's LAST non-null per column
    (``max_by`` keyed on the full order tuple — null-valued rows carry
    a null ordering key, which ``max_by`` ignores), a bucket-level
    carry window over #buckets rows (metadata scale) computes each
    bucket's carry-in, broadcast back, and the per-row LOCF window is
    then partitioned by bucket — parallel across buckets, falling back
    to the carry-in when a bucket has no prior non-null.  Output is
    IDENTICAL to the single-window plan (values are carried, not
    recomputed — no float reassociation), so ``auto`` is hash-safe.
    """
    if strategy not in ("auto", "window", "bucket"):
        raise ValueError("strategy must be auto | window | bucket")

    def _bucketed(df: DataFrame) -> DataFrame:
        from btc_usdt_etl_pipeline_spark.operators.asof import _bucket_col

        d = df.withColumn("_ff_b", _bucket_col(df, order_cols[0]))
        ord_key = F.struct(*[F.col(o) for o in order_cols])
        lasts = d.groupBy("_ff_b").agg(
            *[
                F.max_by(
                    F.col(c),
                    F.when(F.col(c).isNotNull(), ord_key),
                ).alias(f"_ff_last_{c}")
                for c in value_cols
            ]
        )
        wb = Window.orderBy("_ff_b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        carry = lasts.select(
            "_ff_b",
            *[
                F.last(f"_ff_last_{c}", ignorenulls=True)
                .over(wb)
                .alias(f"_ff_carry_{c}")
                for c in value_cols
            ],
        )
        ww = (
            Window.partitionBy("_ff_b")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = d.join(F.broadcast(carry), "_ff_b")
        for c in value_cols:
            out = out.withColumn(
                c,
                F.coalesce(
                    F.last(F.col(c), ignorenulls=True).over(ww),
                    F.col(f"_ff_carry_{c}"),
                ),
            )
        return out.drop(
            "_ff_b", *[f"_ff_carry_{c}" for c in value_cols]
        )

    def _t(df: DataFrame) -> DataFrame:
        if not partition_by and (
            strategy == "bucket"
            or (
                strategy == "auto"
                and _auto_chunked(df, order_cols[0], "auto")
            )
        ):
            return _bucketed(df)
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


def cusum(
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    partition_by: str | None = None,
    order_by: Sequence[str] = ("ts",),
    out: str = "cusum",
) -> Callable[[DataFrame], DataFrame]:
    """One-sided CUSUM changepoint statistic (Page 1954):

        S_t = max(0, S_{t-1} + (x_t − target − slack))

    The recursion looks inherently sequential, but it has the exact
    closed form  S_t = RS_t − min(0, min_{j≤t} RS_j)  where RS is the
    running sum of the deviations d_i = x_i − target − slack — so the
    whole statistic is TWO stacked keyed windows (cumulative sum, then
    running min of that sum), fully parallel and incremental, no
    grouped-map recursion.  The cumulative sum runs through the exact
    decimal idiom, making S_t order-insensitive and replayable
    bit-for-bit by a SQL oracle.

    ``threshold`` adds an ``alarm`` boolean (S_t > h) — the standard
    drift detector; reset-after-alarm variants re-run from the alarm
    point (operationally a filter + recompute, still no recursion).
    """

    def _t(df: DataFrame) -> DataFrame:
        from btc_usdt_etl_pipeline_spark.functions import DEC

        order = [F.col(c) for c in order_by]
        wb = (
            Window.partitionBy(partition_by)
            if partition_by
            else Window.partitionBy()
        )
        w = wb.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        dev = (
            F.col(value_col).cast("double")
            - F.lit(float(target))
            - F.lit(float(slack))
        ).cast(DEC)
        rs = F.sum(dev).over(w).cast("double")
        out_df = df.withColumn("_rs", rs).withColumn(
            out,
            F.col("_rs")
            - F.least(
                F.lit(0.0),
                F.min("_rs").over(
                    wb.orderBy(*order).rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            ),
        )
        if threshold is not None:
            out_df = out_df.withColumn(
                "alarm", F.col(out) > F.lit(float(threshold))
            )
        return out_df.drop("_rs")

    return _t


def acf(
    value_col: str,
    max_lag: int,
    partition_by: str | None = None,
    order_by: Sequence[str] = ("ts",),
    out: str = "acf",
) -> Callable[[DataFrame], DataFrame]:
    """Autocorrelation function r_1..r_max_lag per series:

        r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄)  /  Σ_t (x_t − x̄)²

    (the standard biased estimator — one shared denominator, so the
    sequence is a valid autocovariance and r_0 ≡ 1).  One ordered
    window pass computes all K lags at once; one aggregation reduces
    each series to K numerators + 1 denominator; the per-series rows
    are then unpivoted to long form via an inline array explode —
    three narrow exchanges total, parallel across series, never
    across-lag repeated scans.

    Determinism: x̄ uses the exact-decimal mean; deviation products are
    rounded to 6 dp by the decimal cast before the order-free sums, and
    the final division is a single IEEE op — bit-stable cross-engine
    (no transcendentals anywhere).

    Returns ``(partition_by…, lag, acf)``, lag ∈ 1..max_lag.
    """

    def _t(df: DataFrame) -> DataFrame:
        from btc_usdt_etl_pipeline_spark.functions import DEC

        wg = (
            Window.partitionBy(partition_by)
            if partition_by
            else Window.partitionBy()
        )
        wo = wg.orderBy(*[F.col(c) for c in order_by])
        xbar = (
            F.sum(F.col(value_col).cast(DEC)).over(wg).cast("double")
            / F.count(value_col).over(wg)
        )
        d = df.withColumn("_dev", F.col(value_col) - xbar)
        lag_prods = [
            (F.col("_dev") * F.lag("_dev", k).over(wo)).cast(DEC).alias(
                f"_p{k}"
            )
            for k in range(1, max_lag + 1)
        ]
        staged = d.select(
            *( [partition_by] if partition_by else [] ),
            (F.col("_dev") * F.col("_dev")).cast(DEC).alias("_d2"),
            *lag_prods,
        )
        gcols = [partition_by] if partition_by else []
        agg = staged.groupBy(*gcols).agg(
            F.sum("_d2").cast("double").alias("_den"),
            *[
                F.sum(f"_p{k}").cast("double").alias(f"_n{k}")
                for k in range(1, max_lag + 1)
            ],
        )
        # A constant (or single-row) series has Σdev² = 0: ACF is
        # undefined there and ANSI mode faults the division — emit
        # NULL instead (zipf-hot testdata produces such users).
        pairs = F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.when(
                        F.col("_den") != 0,
                        F.col(f"_n{k}") / F.col("_den"),
                    ).alias(out),
                )
                for k in range(1, max_lag + 1)
            ]
        )
        return agg.select(
            *gcols, F.explode(pairs).alias("_e")
        ).select(*gcols, "_e.lag", f"_e.{out}")

    return _t


def seasonal_decompose(
    value_col: str,
    period: int,
    trend_halfwidth: int | None = None,
    partition_by: str | None = None,
    order_by: Sequence[str] = ("ts",),
) -> Callable[[DataFrame], DataFrame]:
    """Additive seasonal decomposition (STL-lite):

        x_t = trend_t + seasonal_{t mod period} + resid_t

    * trend — centered moving average over ±halfwidth rows (count-aware
      at the series edges: the shrunken frame's own mean, so no null
      margins and every row decomposes);
    * seasonal — per-phase mean of the detrended series (phase = dense
      position mod period), itself centered by subtracting the mean of
      the phase means so the seasonal component sums to ~0 over one
      period (the standard identifiability constraint);
    * resid — what's left.

    Everything is two keyed window families (ordered: the trend frame +
    row position; unordered: per-(key, phase) and per-key means) — no
    joins, no iteration; parallel across series.  Exact-decimal sums
    make every component order-insensitive; the arithmetic is
    add/subtract/divide only, so outputs are bit-stable cross-engine.

    Returns the input plus ``phase, trend, seasonal, resid``.
    """
    h = trend_halfwidth if trend_halfwidth is not None else period // 2

    def _t(df: DataFrame) -> DataFrame:
        from btc_usdt_etl_pipeline_spark.functions import DEC

        wg = (
            Window.partitionBy(partition_by)
            if partition_by
            else Window.partitionBy()
        )
        wo = wg.orderBy(*[F.col(c) for c in order_by])
        frame = wo.rowsBetween(-h, h)
        trend = (
            F.sum(F.col(value_col).cast(DEC)).over(frame).cast("double")
            / F.count(value_col).over(frame)
        )
        phase = F.pmod(F.row_number().over(wo) - 1, F.lit(period)).cast(
            "int"
        )
        d = df.withColumn("trend", trend).withColumn("phase", phase)
        d = d.withColumn("_detr", F.col(value_col) - F.col("trend"))
        wp = (
            Window.partitionBy(partition_by, "phase")
            if partition_by
            else Window.partitionBy("phase")
        )
        phase_mean = (
            F.sum(F.col("_detr").cast(DEC)).over(wp).cast("double")
            / F.count("_detr").over(wp)
        )
        d = d.withColumn("_pm", phase_mean)
        # Center: subtract the mean of the DISTINCT phase means (each
        # phase weighted once, not by its row count) — sum each phase's
        # mean only at its first row position.  The order-free sum here
        # casts at scale 12, not the usual 6: a phase mean is
        # (6-dp-exact sum) / (small count), which for even counts lands
        # EXACTLY on a 6-dp rounding tie (odd last digit / 2 → …5 at
        # digit 7) where Spark's and DuckDB's double→decimal tie-breaks
        # disagree; at 12 dp a terminating quotient is represented
        # exactly (≤ 7-8 digits) and a repeating one never ties.
        wpo = wp.orderBy(*[F.col(c) for c in order_by])
        first_in_phase = F.row_number().over(wpo) == 1
        # Divide by the OBSERVED phase count, not the constant period:
        # a series shorter than `period` realizes fewer phases, and
        # /period would underestimate the grand mean, mis-centering
        # seasonal and resid for short series.  For series >= period
        # rows the two are identical.
        n_phases = F.sum(
            F.when(first_in_phase, F.lit(1)).otherwise(F.lit(0))
        ).over(wg)
        grand = (
            F.sum(
                F.when(first_in_phase, F.col("_pm"))
                .otherwise(F.lit(0.0))
                .cast("decimal(38,12)")
            )
            .over(wg)
            .cast("double")
            / n_phases.cast("double")
        )
        return (
            d.withColumn("seasonal", F.col("_pm") - grand)
            .withColumn(
                "resid",
                F.col(value_col) - F.col("trend") - F.col("seasonal"),
            )
            .drop("_detr", "_pm")
        )

    return _t


def theil_sen(
    value_col: str,
    time_col: str,
    id_col: str,
    partition_by: str | None = None,
    time_scale: float = 1.0,
    max_points: int = 2000,
    out: str = "sen_slope",
) -> Callable[[DataFrame], DataFrame]:
    """Theil–Sen robust trend per series: the median of all pairwise
    slopes (per ``time_scale`` units of ``time_col``), insensitive to
    outliers where OLS is not.

    The pair join is per-KEY quadratic — fine for bounded series,
    fatal for a zipf-hot key (a 100k-event user is 10^10 pairs; the
    un-fenced q182 probe OOM-killed the 10× JVM).  ``max_points``
    fences it the way the dedup family caps band buckets: series
    longer than the cap are first reduced to a deterministic
    ``max_points``-row subsample (portable-hash order over ``id_col``
    — uniform, append-stable, oracle-replayable), bounding pair mass
    at max_points² per key while remaining a valid Theil–Sen
    estimator on a uniform subsample of the series.  Same-time pairs
    are excluded (undefined slope).

    Returns one row per series: ``partition_by…, sen_slope, n_pairs``.
    """

    def _t(df: DataFrame) -> DataFrame:
        gcols = [partition_by] if partition_by else []
        wk = (
            Window.partitionBy(partition_by)
            if partition_by
            else Window.partitionBy()
        )
        pick = F.row_number().over(
            wk.orderBy(
                F.md5(F.col("_id").cast("string")), F.col("_id")
            )
        )
        base = (
            df.select(
                *gcols,
                F.col(id_col).alias("_id"),
                F.col(time_col).cast("double").alias("_t"),
                F.col(value_col).cast("double").alias("_v"),
            )
            .withColumn("_pick", pick)
            .where(F.col("_pick") <= max_points)
            .drop("_pick", "_id")
        )
        a = base.select(
            *gcols, F.col("_t").alias("_t1"), F.col("_v").alias("_v1")
        )
        b = base.select(
            *gcols, F.col("_t").alias("_t2"), F.col("_v").alias("_v2")
        )
        key = gcols if gcols else []
        pairs = (
            a.join(b, key) if key else a.crossJoin(b)
        ).where(F.col("_t2") > F.col("_t1"))
        slope = (F.col("_v2") - F.col("_v1")) / (
            (F.col("_t2") - F.col("_t1")) / F.lit(float(time_scale))
        )
        return (
            pairs.select(*gcols, slope.alias("_s"))
            .groupBy(*gcols)
            .agg(
                F.round(F.percentile("_s", F.lit(0.5)), 6).alias(out),
                F.count(F.lit(1)).alias("n_pairs"),
            )
        )

    return _t
