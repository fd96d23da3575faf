"""JSONL document-corpus source (north-star surface; no reference
analogue — the reference ingests only Binance kline CSV/zip,
``components/ingest_data.py``).

JSONL is the lingua franca of LLM training corpora (one JSON doc per
line, schema drift and truncated lines included), so the reader is
built for hostile input at scale:

- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a FULL extra pass over 100 TB just to infer types; every
  entry point here requires or defaults a schema.
- **Corrupt lines are data, not exceptions.**  PERMISSIVE mode routes
  unparseable lines into a ``_corrupt_record`` column; ``split_corrupt``
  returns (clean, quarantine) DataFrames so a bad shard degrades into a
  metric instead of killing the job.  (DROPMALFORMED silently changes
  row counts — never the default.)
- **Line-splittable.**  Uncompressed (or zstd-framed) JSONL splits on
  newlines, so partition count follows ``maxPartitionBytes`` like any
  columnar scan; a .gz corpus is one partition per FILE — repartition
  after read or, better, re-shard upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default corpus shape, matching the synthetic ``documents`` table plus
#: the quarantine column (must be in the schema for PERMISSIVE capture).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Schema-applied PERMISSIVE JSONL scan with corrupt-line capture."""
    return (
        spark.read.schema(schema or DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split.

    The scan is persisted first: Spark refuses (or recomputes
    inconsistently) a filter that references ONLY ``_corrupt_record``
    on an unmaterialized JSON scan — the documented internal-column
    caveat — and the two branches would otherwise re-read the corpus
    twice anyway."""
    df = df.persist()
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    return good, bad
