"""End-to-end batch ETL runner (SURVEY.md §3.1 engine equivalent).

The reference spreads raw→warehouse over 4 Airflow DAGs with XCom string
serde and driver-heap shuttling (SURVEY.md §3); the engine equivalent is
ONE lazy chain per run:

    read (csv|parquet) → canonicalize → resample → saveAsTable [→ export]

No intermediate materialization, no read-back bounce (anti-pattern
§4.2-3), idempotent warehouse overwrite (§4.2-5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from btc_usdt_etl_pipeline_spark.operators.resample import (
    resample_by_count,
    resample_by_time,
)
from btc_usdt_etl_pipeline_spark.sources.ingest import (
    read_klines_csv,
    read_klines_parquet,
)
from btc_usdt_etl_pipeline_spark.sources.warehouse import export_csv, save_as_table


@dataclass
class EtlConfig:
    input_path: str
    input_format: str = "parquet"  # parquet | csv
    resample_mode: str = "count"  # count | time
    track_each: int = 3600  # reference default (process_data.py:44)
    interval: str = "1 hour"
    table: str = "aggregated_financial_data"
    export_path: str | None = None
    partition_by: tuple[str, ...] = field(default_factory=tuple)


def run_etl(spark: SparkSession, cfg: EtlConfig) -> None:
    reader = read_klines_csv if cfg.input_format == "csv" else read_klines_parquet
    df = reader(spark, cfg.input_path)
    if cfg.resample_mode == "count":
        bars = df.transform(resample_by_count(cfg.track_each))
    else:
        bars = df.transform(resample_by_time(cfg.interval))
    save_as_table(bars, cfg.table, partition_by=cfg.partition_by)
    if cfg.export_path:
        export_csv(spark, cfg.table, cfg.export_path)
