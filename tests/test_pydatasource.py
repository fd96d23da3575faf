"""Spark 4 Python Data Source (sources/pydatasource.py): partition
planning, determinism, ragged ranges, and integration with the resample
operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.sources.pydatasource import (
    SyntheticKlinesDataSource,
    kline_row,
)


def _read(spark, **opts):
    spark.dataSource.register(SyntheticKlinesDataSource)
    r = spark.read.format("synthetic_klines")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_partitions_and_values(spark):
    df = _read(spark, rows=1003, partitions=4)  # ragged last slice
    assert df.count() == 1003
    assert df.rdd.getNumPartitions() == 4
    first = df.orderBy("open_time").first()
    assert tuple(first) == kline_row(0, 1_700_000_000_000, 1000)
    # no duplicate/missing rows across partition boundaries
    assert df.select("open_time").distinct().count() == 1003


def test_deterministic_across_scans(spark):
    a = _read(spark, rows=500).agg(F.sum("close"), F.sum("volume")).first()
    b = _read(spark, rows=500).agg(F.sum("close"), F.sum("volume")).first()
    assert tuple(a) == tuple(b)


def test_feeds_resample_operator(spark):
    from btc_usdt_etl_pipeline_spark.operators.resample import (
        resample_by_count,
    )

    df = _read(spark, rows=1200).withColumn(
        "ts", F.timestamp_millis("open_time")
    )
    bars = df.transform(
        resample_by_count(
            500,
            time_col="ts",
            value_cols={
                "open": "open", "high": "high", "low": "low",
                "close": "close", "count": "close",
            },
        )
    )
    assert bars.count() == 3  # 500 + 500 + ragged 200


def test_zero_rows(spark):
    assert _read(spark, rows=0).count() == 0
