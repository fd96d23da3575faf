"""Semantic unit tests for the financial indicator pack (q69-q72):
hand-computed expectations on tiny series, plus the null/edge contracts
(series head, gap days, zero volume) that the oracle comparison alone
would only exercise by accident."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_drawdown_running_peak(spark):
    # prices 10, 8, 12, 6: peak path 10,10,12,12 -> worst dip 6/12-1 = -0.5
    rows = [(i, 1, i, float(v)) for i, v in enumerate([10, 8, 12, 6])]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, value double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.select("user_id", "value", F.max("value").over(w).alias("peak"))
        .groupBy("user_id")
        .agg(F.min(F.col("value") / F.col("peak") - 1.0).alias("mdd"))
        .first()
    )
    assert out.mdd == -0.5


def test_ewma_truncated_weights_and_head(spark):
    # Constant series: EWMA must equal the constant at every position,
    # including the head where fewer taps exist (weight renormalizes).
    rows = [(i, 1, i, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, value double")
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num, den = F.col("value"), F.lit(1.0)
    for i, wgt in ((1, 0.5), (2, 0.25), (3, 0.125), (4, 0.0625)):
        lagc = F.lag("value", i).over(wb)
        num = num + F.when(lagc.isNull(), 0.0).otherwise(F.lit(wgt) * lagc)
        den = den + F.when(lagc.isNull(), 0.0).otherwise(F.lit(wgt))
    vals = [r.e for r in df.select((num / den).alias("e")).collect()]
    assert all(math.isclose(v, 5.0) for v in vals)

    # Step series 0,...,0,16: the step's EWMA is 16/den where den carries
    # the 4 zero taps at full weight -> 16 / 1.9375
    rows2 = [(i, 1, i, 0.0) for i in range(4)] + [(4, 1, 4, 16.0)]
    df2 = spark.createDataFrame(rows2, "event_id long, user_id long, ts long, value double")
    last = (
        df2.select("event_id", (num / den).alias("e"))
        .orderBy("event_id")
        .collect()[-1]
    )
    assert math.isclose(last.e, 16.0 / 1.9375)


def test_vwap_weighted_not_mean(spark):
    # Two trades, price 10 vol 1 and price 20 vol 3 -> VWAP 17.5, not 15.
    from btc_usdt_etl_pipeline_spark.functions import exact_sum

    rows = [(1, 10.0, 1), (1, 20.0, 3)]
    df = spark.createDataFrame(rows, "user_id long, value double, k long")
    out = (
        df.groupBy("user_id")
        .agg((exact_sum(F.col("value") * F.col("k")) / F.sum("k")).alias("vwap"))
        .first()
    )
    assert out.vwap == 17.5


def test_atr_gap_day_uses_prev_close(spark):
    # Day 1: H=10 L=9 C=10.  Day 2 gaps up: H=15 L=14.
    # TR(day2) = max(15-14, |15-10|, |14-10|) = 5 — the gap, not the range.
    rows = [
        (1, 1, 9.5), (1, 2, 10.0), (1, 3, 9.0),   # day1: order -> close 9.0? no:
    ]
    # build explicitly: (user, day, high, low, close) bars to isolate TR math
    bars = spark.createDataFrame(
        [(1, 1, 10.0, 9.0, 10.0), (1, 2, 15.0, 14.0, 15.0)],
        "user_id long, day long, high double, low double, close double",
    )
    wb = Window.partitionBy("user_id").orderBy("day")
    prev_close = F.lag("close").over(wb)
    tr = bars.select(
        "day",
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        ).alias("tr"),
    ).orderBy("day").collect()
    assert tr[0].tr == 1.0  # head row: null lag skipped, plain range
    assert tr[1].tr == 5.0  # gap day: |high - prev_close| dominates


def test_cusum_matches_recursion(spark):
    """The two-window closed form == the textbook sequential recursion."""
    import random

    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.operators.windows import cusum

    rng = random.Random(5)
    rows = [
        (k, i, round(rng.uniform(0, 40), 2))
        for k in range(4)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k int, i int, x double")
    out = {
        (r["k"], r["i"]): (r["cusum"], r["alarm"])
        for r in df.transform(
            cusum(
                "x", target=20.0, slack=2.0, threshold=30.0,
                partition_by="k", order_by=("i",),
            )
        ).collect()
    }
    for k in range(4):
        s = 0.0
        for i in range(200):
            x = dict(((kk, ii), v) for kk, ii, v in rows)[(k, i)]
            s = max(0.0, s + (x - 20.0 - 2.0))
            got, alarm = out[(k, i)]
            assert abs(got - s) < 1e-6, (k, i, got, s)
            assert alarm == (got > 30.0)


def test_theil_sen_robust_to_outlier(spark):
    """Sen slope ignores a gross outlier that wrecks the OLS fit."""
    from pyspark.sql import functions as F

    rows = [(1, float(i), 2.0 * i + 1.0) for i in range(20)]
    rows[10] = (1, 10.0, 1e6)  # outlier
    df = spark.createDataFrame(rows, "k int, t double, v double")
    a = df.select("k", F.col("t").alias("t1"), F.col("v").alias("v1"))
    b = df.select("k", F.col("t").alias("t2"), F.col("v").alias("v2"))
    pairs = a.join(b, "k").where(F.col("t2") > F.col("t1"))
    sen = pairs.select(
        ((F.col("v2") - F.col("v1")) / (F.col("t2") - F.col("t1"))).alias("s")
    ).agg(F.percentile("s", F.lit(0.5)).alias("m")).collect()[0]["m"]
    assert abs(sen - 2.0) < 0.05  # the true slope, outlier shrugged off
