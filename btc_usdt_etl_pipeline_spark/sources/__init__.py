"""Sources & sinks: ingest (Binance), lake (s3a/MinIO), warehouse."""

from btc_usdt_etl_pipeline_spark.sources.ingest import (  # noqa: F401
    build_urls,
    download_and_extract,
    read_klines_csv,
    read_klines_parquet,
)
from btc_usdt_etl_pipeline_spark.sources.lake import configure_s3a  # noqa: F401
from btc_usdt_etl_pipeline_spark.sources.warehouse import (  # noqa: F401
    export_csv,
    save_as_table,
)
