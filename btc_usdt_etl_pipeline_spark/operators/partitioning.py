"""Partitioning hygiene shared by operators.

Small-file inputs (one parquet row group) give Spark a single input
partition, which serializes every downstream expression no matter how
many cores exist.  At 100 TB inputs arrive with thousands of splits and
these helpers are no-ops; on under-partitioned inputs they buy full
parallelism for one extra (cheap, row-count-bounded) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition by ``keys`` iff the plan has fewer partitions than the
    cluster's default parallelism.  Keyed repartition (not round-robin) so
    downstream groupBys on the same keys can reuse the exchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
