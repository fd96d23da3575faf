"""btc_usdt_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (danhtran2mind/BTC-USDT-ETL-Pipeline,
surveyed in /root/repo/SURVEY.md), extended with the relational, streaming and
LLM-data-pipeline operator surface declared in SURVEY.md §2B.

Layout
------
- ``session``    : SparkSession builder tuned for the target scale.
- ``schema``     : canonical kline / bar schemas + epoch normalization.
- ``functions``  : exact (oracle-reproducible) aggregate helpers, vector math.
- ``operators``  : composable DataFrame -> DataFrame transforms (use via
                   ``df.transform(op(...))``): resample, windows, relational,
                   as-of join, dedup, similarity, text, multimodal.
- ``sources``    : ingest (Binance zip crawler), lake (s3a), warehouse.
- ``streaming``  : Structured Streaming OHLCV with watermarks.
- ``ml``         : feature ops (min-max scale, sliding sequences, splits,
                   regression metrics) as DataFrame ops.
- ``pipeline``   : config-driven batch runner replacing the reference DAGs.

Everything compiles to public DataFrame / SQL / ML / Structured Streaming
APIs — no custom Catalyst rules (SURVEY.md §4.3).
"""

__version__ = "0.1.0"
