"""Ingest sources (SURVEY.md §2A S1-S9).

The reference downloads monthly Binance kline zips on the driver
(``/root/reference/components/btcusdt_ingest_data.py:36-153``), shuttles
CSV lines through the driver heap (anti-pattern §4.2-4) and parses with
pandas.  Here the *control plane* (URL construction from the same YAML
config schema, zip fetch to a landing dir) stays driver-side — it is not a
query op — while every *data* byte is read executor-side by Spark
(schema-on-read CSV, no header rewrite, no driver materialization).
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from btc_usdt_etl_pipeline_spark.schema import KLINE_SCHEMA, canonicalize_klines


def build_urls(
    sources: Iterable[dict], periods: Iterable[str]
) -> list[str]:
    """URL list from the reference's config schema
    (``configs/data_sources.yml`` name/url rows × allowed periods;
    reference URL formula at ``btcusdt_ingest_data.py:134``:
    ``{url}{name}-{period}.zip``)."""
    return [
        f"{src['url']}{src['name']}-{period}.zip"
        for src in sources
        for period in periods
    ]


def download_and_extract(url: str, landing_dir: str) -> str:
    """Fetch one zip and land its first member as CSV (S1 parity).

    Driver-side by design (one small HTTP fetch per month); gated behind a
    lazy import so offline environments can still import the module.
    """
    import urllib.request

    os.makedirs(landing_dir, exist_ok=True)
    with urllib.request.urlopen(url) as resp:  # noqa: S310 — public dataset URL
        payload = resp.read()
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        member = zf.namelist()[0]
        target = os.path.join(landing_dir, os.path.basename(member))
        with zf.open(member) as src, open(target, "wb") as dst:
            dst.write(src.read())
    return target


def read_klines_csv(spark: SparkSession, path: str) -> DataFrame:
    """Headerless Binance CSV → canonical kline DataFrame.

    Schema-on-read replaces the reference's header-injection rewrite
    (S3, ``btcusdt_ingest_data.py:11-34``) — no data pass, executor-side,
    splittable."""
    raw = spark.read.schema(KLINE_SCHEMA).csv(path, header=False)
    return canonicalize_klines(raw)


def read_klines_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-applied Parquet scan (S7 parity, ``process_data.py:27-42``)."""
    return canonicalize_klines(spark.read.parquet(path))
