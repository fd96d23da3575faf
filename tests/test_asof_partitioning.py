"""Tests for as-of join directions/tolerance, keyed resample, and
partition-pruned reads."""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.asof import asof_join
from btc_usdt_etl_pipeline_spark.operators.resample import resample_by_count


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 10)], "sym int, t long"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 25, 200.0), (1, 30, 300.0), (2, 50, 400.0)],
        "sym int, t long, px double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    got = {
        (r.sym, r.t): r.px
        for r in asof_join(left, right, "t", by=["sym"]).collect()
    }
    # t=25 matches the right row AT 25 (inclusive); t=10 carries t=5
    assert got == {(1, 10): 100.0, (1, 25): 200.0, (1, 40): 300.0,
                   (2, 10): None}


def test_asof_forward(spark):
    left, right = _sides(spark)
    got = {
        (r.sym, r.t): r.px
        for r in asof_join(
            left, right, "t", by=["sym"], direction="forward"
        ).collect()
    }
    # earliest right row at-or-after each left time
    assert got == {(1, 10): 200.0, (1, 25): 200.0, (1, 40): None,
                   (2, 10): 400.0}


def test_asof_tolerance(spark):
    left, right = _sides(spark)
    got = {
        (r.sym, r.t): r.px
        for r in asof_join(
            left, right, "t", by=["sym"], tolerance=5
        ).collect()
    }
    # t=10 would carry t=5 (age 5, within); t=40 would carry t=30
    # (age 10, dropped)
    assert got == {(1, 10): 100.0, (1, 25): 200.0, (1, 40): None,
                   (2, 10): None}


def test_asof_property_vs_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lts=st.lists(
            st.integers(min_value=0, max_value=100),
            min_size=1, max_size=25, unique=True,
        ),
        rts=st.lists(
            st.integers(min_value=0, max_value=100),
            min_size=1, max_size=25, unique=True,
        ),
        direction=st.sampled_from(["backward", "forward"]),
    )
    def run(lts, rts, direction):
        left = spark.createDataFrame([(t,) for t in lts], "t long")
        right = spark.createDataFrame(
            [(t, float(t * 10)) for t in rts], "t long, px double"
        )
        got = {
            r.t: r.px
            for r in asof_join(
                left, right, "t", direction=direction
            ).collect()
        }

        def py_asof(t):
            if direction == "backward":
                cands = [rt for rt in rts if rt <= t]
                return float(max(cands) * 10) if cands else None
            cands = [rt for rt in rts if rt >= t]
            return float(min(cands) * 10) if cands else None

        assert got == {t: py_asof(t) for t in lts}

    run()


def test_asof_unkeyed_tolerance(spark):
    left = spark.createDataFrame([(10,), (25,), (40,)], "t long")
    right = spark.createDataFrame(
        [(5, 100.0), (25, 200.0), (30, 300.0)], "t long, px double"
    )
    got = {
        r.t: r.px
        for r in asof_join(left, right, "t", tolerance=5).collect()
    }
    # t=40 would carry t=30 (age 10) — dropped by tolerance 5
    assert got == {10: 100.0, 25: 200.0, 40: None}


def test_asof_unkeyed_null_values_locf_across_buckets(spark):
    # The numeric bucket path uses width-1 buckets on a 0..100 span, so
    # t=5 and t=6 land in different buckets: the carry-in must skip the
    # null px at t=6 and surface 100.0 from the earlier bucket — the same
    # ignore-nulls semantics as the keyed window path.
    left = spark.createDataFrame([(10,), (100,)], "t long")
    right = spark.createDataFrame(
        [(5, 100.0), (6, None), (50, 500.0)], "t long, px double"
    )
    got = {r.t: r.px for r in asof_join(left, right, "t").collect()}
    assert got == {10: 100.0, 100: 500.0}


def test_asof_unkeyed_timestamp_day_buckets(spark):
    # Timestamp series cross day boundaries → day-bucket carry path.
    left = spark.createDataFrame(
        [("2024-01-01 06:00:00",), ("2024-01-03 00:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [("2024-01-01 05:00:00", 1.0), ("2024-01-02 12:00:00", 2.0)],
        "ts string, px double",
    ).select(F.col("ts").cast("timestamp").alias("t"), "px")
    got = sorted(
        (r.t.isoformat(), r.px)
        for r in asof_join(left, right, "t").collect()
    )
    assert [px for _, px in got] == [1.0, 2.0]


def test_asof_column_collision_raises(spark):
    import pytest

    left = spark.createDataFrame([(10, 1.0)], "t long, px double")
    right = spark.createDataFrame([(5, 2.0)], "t long, px double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "t")


def test_asof_empty_right(spark):
    left = spark.createDataFrame([(10,), (20,)], "t long")
    right = spark.createDataFrame([], "t long, px double")
    got = {r.t: r.px for r in asof_join(left, right, "t").collect()}
    assert got == {10: None, 20: None}


def test_keyed_resample(spark):
    rows = [(s, 1000 * i, float(10 * s + i)) for s in (1, 2) for i in range(7)]
    df = spark.createDataFrame(rows, "sym int, open_time long, close double")
    vc = {"open": "close", "high": "close", "low": "close",
          "close": "close", "count": "x"}
    bars = df.transform(
        resample_by_count(3, value_cols=vc, partition_by=["sym"])
    ).collect()
    # per symbol: 7 rows / 3 → 3 bars each
    per_sym = {}
    for b in bars:
        per_sym.setdefault(b.sym, []).append(b)
    assert {k: len(v) for k, v in per_sym.items()} == {1: 3, 2: 3}
    assert [b.n_rows for b in per_sym[1]] == [3, 3, 1]
    # first bar of sym 2 opens at its own first row, not sym 1's
    assert per_sym[2][0].open == 20.0


def test_partition_pruning(spark):
    from btc_usdt_etl_pipeline_spark.plans import has_partition_pruning

    with tempfile.TemporaryDirectory() as d:
        df = spark.range(1000).select(
            (F.col("id") % 12).alias("month"), F.col("id").alias("v")
        )
        df.write.mode("overwrite").partitionBy("month").parquet(f"{d}/t")
        q = spark.read.parquet(f"{d}/t").filter(F.col("month") == 3)
        # (inputFiles() reflects the unpruned relation, so the plan's
        # PartitionFilters entry is the authoritative pruning signal)
        assert has_partition_pruning(q)
        assert q.count() == sum(1 for i in range(1000) if i % 12 == 3)


def test_plans_api(spark):
    from btc_usdt_etl_pipeline_spark.plans import (
        join_kinds,
        pushed_filters,
        read_columns,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit("pad").alias("unused")
        ).write.parquet(f"{d}/t")
        q = (
            spark.read.parquet(f"{d}/t")
            .filter(F.col("k") > 10)
            .select("k", "v")
        )
        assert any("GreaterThan(k" in f for f in pushed_filters(q))
        assert read_columns(q) == [["k", "v"]]
        small = spark.range(10).select(F.col("id").alias("k"))
        assert "BroadcastHashJoin" in join_kinds(q.join(small, "k"))


def test_asof_numeric_bucket_width_skips_probe_job(spark):
    """With an explicit bucket_width, building the unkeyed numeric as-of
    plan must fire NO Spark job (the min/max range probe is the fallback,
    not the default cost); without it, the probe job is expected."""
    from btc_usdt_etl_pipeline_spark.operators.asof import asof_join

    left = spark.range(200).select(
        F.col("id").alias("t"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(40).select(
        (F.col("id") * 5).alias("t"), F.col("id").cast("double").alias("rv")
    )
    tracker = spark.sparkContext.statusTracker()

    spark.sparkContext.setJobGroup("asof-width", "plan-only")
    try:
        planned = asof_join(
            left, right, time_col="t", right_value_cols=["rv"],
            bucket_width=16,
        )
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert tracker.getJobIdsForGroup("asof-width") == []

    spark.sparkContext.setJobGroup("asof-probe", "probe-expected")
    try:
        probed = asof_join(
            left, right, time_col="t", right_value_cols=["rv"]
        )
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert tracker.getJobIdsForGroup("asof-probe") != []

    # same answer either way
    a = sorted(map(tuple, planned.collect()))
    b = sorted(map(tuple, probed.collect()))
    assert a == b and len(a) == 200
