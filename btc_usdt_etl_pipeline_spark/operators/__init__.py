"""Composable DataFrame -> DataFrame operators (use via ``df.transform(op(...))``)."""

from btc_usdt_etl_pipeline_spark.operators.resample import (  # noqa: F401
    resample_by_count,
    resample_by_time,
    with_global_index,
)
