"""ML feature pipeline as DataFrame ops (SURVEY.md §2A A4-A6, W6; M6)."""

from btc_usdt_etl_pipeline_spark.ml.features import (  # noqa: F401
    min_max_scale,
    positional_split,
    regression_metrics,
    sliding_sequences,
)
