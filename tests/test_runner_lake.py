"""Coverage for the remaining pipeline/source branches: time-mode ETL,
s3a conf plumbing, multi-file export, quality_features operator."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.text import quality_features
from btc_usdt_etl_pipeline_spark.pipeline.runner import EtlConfig, run_etl
from btc_usdt_etl_pipeline_spark.sources.lake import configure_s3a
from btc_usdt_etl_pipeline_spark.sources.warehouse import export_csv
from tests.conftest import make_klines


def test_etl_time_mode(spark):
    with tempfile.TemporaryDirectory() as d:
        make_klines(spark, 7200, start_ms=1_700_002_800_000).write.parquet(
            f"{d}/in"
        )
        run_etl(
            spark,
            EtlConfig(
                input_path=f"{d}/in",
                input_format="parquet",
                resample_mode="time",
                interval="1 hour",
                table="t_time_bars",
            ),
        )
        bars = spark.table("t_time_bars").orderBy("window_start").collect()
        assert len(bars) == 2
        assert bars[0].number_of_trades + bars[1].number_of_trades == (
            spark.table("t_time_bars").agg(
                F.sum("number_of_trades")
            ).first()[0]
        )


def test_configure_s3a_sets_hadoop_conf(spark):
    configure_s3a(
        spark, "http://localhost:9000", "ak", "sk", path_style=True
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.path.style.access") == "true"


def test_export_csv_multi_file(spark):
    with tempfile.TemporaryDirectory() as d:
        spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).write.saveAsTable("t_export_src")
        export_csv(spark, "t_export_src", f"{d}/out", single_file=False)
        back = spark.read.option("header", "true").csv(f"{d}/out")
        assert back.count() == 100


def test_quality_features_operator(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox!"), (2, "")],
        "id long, text string",
    )
    rows = {r.id: r for r in df.transform(quality_features()).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 4
    assert r1.n_chars_calc == 20
    assert 0 < r1.alpha_ratio < 1
    assert r1.punct_ratio > 0
    assert r1.stopword_ratio == 0.25  # "the" of 4 tokens
    assert rows[2].n_tokens == 0
