"""Frequency-sketch operators (north star §2B — text analysis at scale).

Count-min sketch (Cormode & Muthukrishnan 2005) over a key column, plus
CMS-backed heavy-hitter extraction.  At 100 TB the full per-key exact
count is a corpus-wide shuffle keyed by a Zipf-skewed vocabulary; the CMS
is a fixed ``depth × width`` grid of counters — mergeable across
partitions, machines, and days — and the standard way to track hot
tokens/URLs/shingles without carrying the key space.

Determinism/oracle story: bucket assignment uses the repo's portable
60-bit md5 hash (``operators/dedup.py:portable_hash60``) with a per-row
seed prefix, so a SQL oracle replays the exact grid; no RNG state.

Plan shapes (all single-pass, no UDFs):

- :func:`count_min_sketch` — ONE groupBy of the (already key-counted)
  input onto ``depth·width`` cells; the grid is metadata-sized.
- :func:`cms_heavy_hitters` — candidates are the vocabulary-sized
  distinct-key table; each candidate probes its ``depth`` cells via an
  equi-join against the (broadcast-small) grid and takes the row-min —
  the textbook ``est = min_r CMS[r][h_r(key)]`` with ``est ≥ exact``
  guaranteed.  Exact counts ride along so the overestimate is visible.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.dedup import portable_hash60


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in sketch row ``row`` — portable across engines
    (md5-based), non-negative, ``[0, width)``."""
    return (
        portable_hash60(F.concat(F.lit(f"cms{row}:"), key)) % F.lit(width)
    ).cast("int")


def _probe_cells(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(key, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def count_min_sketch(
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    count_col: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Build the CMS grid: one row per ``(row, bucket)`` cell with its
    counter.  Input is one row per key occurrence, or pre-aggregated
    ``(key, count)`` when ``count_col`` is given (the two are exactly
    equivalent — cell values are sums either way — and the
    pre-aggregated form folds the corpus-wide pass into a count the
    caller usually needs anyway)."""

    def _t(df: DataFrame) -> DataFrame:
        cnt = (
            F.col(count_col).cast("long")
            if count_col
            else F.lit(1).cast("long")
        )
        return (
            df.select(
                F.explode(
                    _probe_cells(F.col(key_col), depth, width)
                ).alias("_cell"),
                cnt.alias("_n"),
            )
            .groupBy(
                F.col("_cell.row").alias("row"),
                F.col("_cell.bucket").alias("bucket"),
            )
            .agg(F.sum("_n").alias("cnt"))
        )

    return _t


def cms_heavy_hitters(
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` keys by count-min ESTIMATE (row-min of probed cells),
    with the exact count alongside so ``est ≥ exact`` is observable.
    Deterministic order: estimate desc, key asc.

    Input: one row per key occurrence.  The exact per-key count table
    is built once (vocabulary-sized) and feeds BOTH the sketch grid and
    the candidate probes, so the corpus is scanned exactly once.
    """

    def _t(df: DataFrame) -> DataFrame:
        keys = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact"))
        grid = keys.transform(
            count_min_sketch(key_col, depth, width, count_col="exact")
        )
        probes = keys.select(
            key_col,
            "exact",
            F.explode(
                _probe_cells(F.col(key_col), depth, width)
            ).alias("_cell"),
        ).select(
            key_col, "exact", F.col("_cell.row").alias("row"),
            F.col("_cell.bucket").alias("bucket"),
        )
        est = (
            probes.join(F.broadcast(grid), ["row", "bucket"])
            .groupBy(key_col, "exact")
            .agg(F.min("cnt").alias("est"))
        )
        # Distributed top-k: orderBy().limit(k) compiles to
        # TakeOrderedAndProject (per-partition partial top-k, merge of
        # k-sized heaps on the driver) — the vocabulary-sized estimate
        # table (10^8+ keys at 100 TB) is never sorted on one task.
        # ``rnk`` is re-derived over the k-row result, where an unkeyed
        # window is metadata-scale and free.
        topk = est.orderBy(F.col("est").desc(), F.col(key_col)).limit(k)
        w = Window.orderBy(F.col("est").desc(), F.col(key_col))
        return topk.select(
            key_col, "exact", "est", F.row_number().over(w).alias("rnk")
        )

    return _t
