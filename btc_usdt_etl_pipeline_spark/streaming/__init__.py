"""Structured Streaming surface (SURVEY.md M5)."""

from btc_usdt_etl_pipeline_spark.streaming.ohlcv import (  # noqa: F401
    run_available_now,
    streaming_ohlcv,
    streaming_sessionize,
)
