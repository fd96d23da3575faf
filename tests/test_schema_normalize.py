"""Unit tests for schema-driven event-time normalization (SURVEY §4.2-6).

Covers all four epoch magnitudes (s / ms / µs / ns) and all three storage
types (epoch long, timestamp, timestamp_ntz) the driver's parquet has
shipped, plus exactness of the ns→µs truncation at 1.7e18 (where double
division would round).
"""

from __future__ import annotations

import datetime
import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from btc_usdt_etl_pipeline_spark.schema import (  # noqa: E402
    normalize_epoch,
    normalize_event_time,
)

# 2024-01-22T00:37:51.083496 UTC in each unit.
_US = 1_705_883_871_083_496
_EXPECT_US = datetime.datetime(2024, 1, 22, 0, 37, 51, 83496)


@pytest.fixture(autouse=True)
def _utc(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize(
    ("raw", "expect"),
    [
        (_US // 1_000_000, _EXPECT_US.replace(microsecond=0)),  # seconds
        (_US // 1_000, _EXPECT_US.replace(microsecond=83000)),  # millis
        (_US, _EXPECT_US),  # micros
        (_US * 1_000 + 999, _EXPECT_US),  # nanos, truncated not rounded
    ],
)
def test_normalize_epoch_all_units(spark, raw, expect):
    got = (
        spark.range(1)
        .select(normalize_epoch(F.lit(raw).cast("long")).alias("ts"))
        .first()["ts"]
    )
    assert got == expect


def test_normalize_event_time_long_column(spark):
    df = spark.createDataFrame([(_US * 1_000,)], "ts long")
    out = normalize_event_time(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    assert out.first()["ts"] == _EXPECT_US


def test_normalize_event_time_timestamp_passthrough(spark):
    df = spark.createDataFrame([(_EXPECT_US,)], "ts timestamp")
    out = normalize_event_time(df)
    assert out is df  # no-op, no extra projection
    assert out.first()["ts"] == _EXPECT_US


def test_normalize_event_time_ntz_cast(spark):
    df = spark.createDataFrame([(_EXPECT_US,)], "ts timestamp_ntz")
    out = normalize_event_time(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    # Under the UTC session timezone the cast is value-identical.
    assert out.first()["ts"] == _EXPECT_US


def test_normalize_event_time_rejects_strings(spark):
    df = spark.createDataFrame([("2024-01-01",)], "ts string")
    with pytest.raises(TypeError, match="unsupported event-time type"):
        normalize_event_time(df)


def test_ns_truncation_is_exact_not_double(spark):
    """1.7e18 ns is beyond double's 53-bit mantissa: a float division by
    1000 would land on the wrong microsecond.  The decimal path must not."""
    ns = 1_705_883_871_083_496_789  # ...496.789 µs → truncates to ...496
    got = (
        spark.range(1)
        .select(normalize_epoch(F.lit(ns).cast("long")).alias("ts"))
        .first()["ts"]
    )
    assert got == _EXPECT_US
