"""Shared Spark session + fixture builders for the engine test suite."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="wh-"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def kline_rows(n: int, start_ms: int = 1_700_000_000_000, step_ms: int = 1000):
    """Gap-free 1s kline fixture rows in canonical column order."""
    rows = []
    for i in range(n):
        t = start_ms + i * step_ms
        px = 100.0 + (i % 7) - (i % 3)
        rows.append(
            (
                t,                # open_time
                px,               # open
                px + 2.0,         # high
                px - 1.5,         # low
                px + 0.5,         # close
                10.0 + i % 5,     # volume
                t + 999,          # close_time
                1000.0,           # quote_asset_volume
                int(1 + i % 4),   # number_of_trades
                5.0,              # taker_buy_base
                500.0,            # taker_buy_quote
                0,                # ignore
            )
        )
    return rows


KLINE_DDL = (
    "open_time long, open double, high double, low double, close double, "
    "volume double, close_time long, quote_asset_volume double, "
    "number_of_trades long, taker_buy_base_asset_volume double, "
    "taker_buy_quote_asset_volume double, ignore long"
)


def make_klines(spark, n: int, **kw):
    return spark.createDataFrame(kline_rows(n, **kw), KLINE_DDL)
