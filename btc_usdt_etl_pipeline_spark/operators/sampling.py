"""Deterministic, seedless, engine-portable sampling.

``df.sample()`` draws from a per-partition RNG stream: the kept set
changes with partitioning, retries, and engine — useless for a
reproducible training-data pipeline and impossible to oracle-check.
The portable idiom hashes a STABLE KEY instead: keep a row iff
``md5(salt:key) mod 10_000 < rate_bp``.  Properties:

- deterministic under any partitioning / cluster size / engine;
- per-stratum rates are just a CASE over the rate column — stratified
  sampling without a shuffle (no groupBy anywhere, pure map-side);
- changing ``salt`` redraws an independent sample; keeping it fixed
  makes the sample APPEND-STABLE: rows sampled yesterday are sampled
  today, so incremental pipeline runs agree with full recomputes.

The hash is the repo's portable 60-bit md5 (``portable_hash60``), which
any SQL engine can replay — the q63 oracle reproduces the exact kept
set in DuckDB.  Production can swap xxhash64 for md5 once cross-engine
replay stops mattering; the contract is the same.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.dedup import portable_hash60


def hash_sample(
    key_col: str,
    rate_bp: int = 1000,
    stratum_col: str | None = None,
    stratum_rates_bp: Mapping[str, int] | None = None,
    salt: str = "s1",
) -> Callable[[DataFrame], DataFrame]:
    """Keep rows where ``hash(salt:key) mod 10000 < rate`` (basis points:
    1000 = 10%).  ``stratum_rates_bp`` overrides the rate per value of
    ``stratum_col``; strata not listed fall back to ``rate_bp``."""
    if not 0 <= rate_bp <= 10_000:
        raise ValueError("rate_bp must be in [0, 10000]")

    def _t(df: DataFrame) -> DataFrame:
        h = portable_hash60(
            F.concat(
                F.lit(salt), F.lit(":"), F.col(key_col).cast("string")
            )
        ) % F.lit(10_000)
        rate = F.lit(rate_bp)
        if stratum_rates_bp:
            if stratum_col is None:
                raise ValueError("stratum_rates_bp requires stratum_col")
            expr = F.lit(rate_bp)
            for value, bp in sorted(stratum_rates_bp.items()):
                expr = F.when(
                    F.col(stratum_col) == value, F.lit(bp)
                ).otherwise(expr)
            rate = expr
        return df.filter(h < rate)

    return _t
