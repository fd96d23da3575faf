"""Structured Streaming surface (SURVEY.md M5)."""

from btc_usdt_etl_pipeline_spark.streaming.asof import (  # noqa: F401
    incremental_asof_upsert,
    read_asof_result,
)
from btc_usdt_etl_pipeline_spark.streaming.neardup import (  # noqa: F401
    compact_contributions,
    compact_neardup_state,
    incremental_minhash_upsert,
    read_neardup_pairs,
)
from btc_usdt_etl_pipeline_spark.streaming.ohlcv import (  # noqa: F401
    run_available_now,
    streaming_ohlcv,
    streaming_sessionize,
)
