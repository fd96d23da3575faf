"""Config-driven batch pipeline (replaces the reference's Airflow DAGs)."""

from btc_usdt_etl_pipeline_spark.pipeline.runner import run_etl  # noqa: F401
