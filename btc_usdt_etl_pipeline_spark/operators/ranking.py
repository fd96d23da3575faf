"""Retrieval-quality evaluation metrics over ranked candidate lists.

The eval layer of a search / RAG / recommender pipeline: given a table
of (query, candidate, relevance) rows and a ranking order, score each
query with the three standard graded-and-binary relevance metrics —

* **NDCG@k** — graded: DCG@k = Σ_{i≤k} (2^rel − 1) / log2(i + 1),
  normalized by the ideal DCG of the same relevance multiset.
* **Reciprocal rank** — binary: 1 / (first rank with rel > 0).
* **Average precision** — binary: mean of precision@i over the
  relevant hit positions i.

Scale shape: ONE ordered window per query partition assigns ranks
(queries are many and small — the partition key IS the query id, so
the work spreads across the cluster; there is no global sort), a
second window over the same partitioning does the ideal ordering and
the running sums, then one groupBy(query) collapses to a metrics row
per query.  Row-scale work is two window passes + one agg, all
JVM-side column expressions — no UDFs.

Determinism contract: ranks are total orders (the caller's
``order_by`` must include a unique tiebreaker).  The per-position DCG
and precision terms carry transcendentals / per-row divisions, so each
term is rounded to 6 dp via the exact-decimal cast BEFORE the
order-free sum — the same contract the drift module documents — and
final ratios are pinned at 6 dp.  Reciprocal rank is one exact IEEE
division, left unrounded.

No counterpart in the reference repo (its single Spark job is the
OHLCV resample, components/process_data.py:44-59); this module is part
of the declared capability extension surface (SURVEY.md §2B eval ops).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.functions import DEC


def retrieval_metrics(
    query_col: str,
    order_by: Sequence[Column],
    rel_col: str,
    k: int = 10,
) -> Callable[[DataFrame], DataFrame]:
    """Per-query NDCG@k, reciprocal rank, and average precision.

    ``order_by`` is the ranking order (best candidate first) and must
    be a TOTAL order — include a unique id as the last key, or tied
    candidates would make row_number nondeterministic across runs and
    engines.  ``rel_col`` is a non-negative integer grade; rel > 0 is
    the binary relevance cut for RR / AP.

    Returns one row per query:
    ``query_col, n_docs, n_rel, ndcg_k, rr, ap`` —
    ``ndcg_k`` NULL when the query has no relevant candidate (ideal
    DCG 0), ``rr``/``ap`` NULL likewise.  NULL relevance rows are
    dropped (they are unjudged candidates, not grade 0 — callers who
    mean 0 should coalesce first).
    """

    def _t(df: DataFrame) -> DataFrame:
        d = df.where(F.col(rel_col).isNotNull())
        w = Window.partitionBy(query_col).orderBy(*order_by)
        # Ideal ordering: same partitioning, relevance descending with
        # the actual rank as tiebreaker (any total order of equal
        # grades yields the same ideal DCG; the tiebreaker only pins
        # determinism).
        rel = F.col(rel_col).cast("double")
        ranked = d.select(
            query_col,
            rel.alias("_rel"),
            F.row_number().over(w).alias("_i"),
        )
        wi = Window.partitionBy(query_col).orderBy(
            F.col("_rel").desc(), F.col("_i")
        )
        wcum = (
            Window.partitionBy(query_col)
            .orderBy("_i")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        gain = F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)
        dcg_term = F.when(
            F.col("_i") <= k,
            gain / F.log2(F.col("_i").cast("double") + F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        ideal_i = F.row_number().over(wi)
        igain = F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)
        idcg_term = F.when(
            ideal_i <= k,
            igain / F.log2(ideal_i.cast("double") + F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        hit = (F.col("_rel") > 0).cast("long")
        cum_rel = F.sum(hit).over(wcum)
        # precision@i at relevant positions only
        ap_term = F.when(
            F.col("_rel") > 0,
            cum_rel.cast("double") / F.col("_i").cast("double"),
        ).otherwise(F.lit(0.0))
        terms = ranked.select(
            query_col,
            "_i",
            hit.alias("_hit"),
            dcg_term.cast(DEC).alias("_dcg"),
            idcg_term.cast(DEC).alias("_idcg"),
            ap_term.cast(DEC).alias("_ap"),
        )
        agg = terms.groupBy(query_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_hit").alias("n_rel"),
            F.sum("_dcg").cast("double").alias("_sdcg"),
            F.sum("_idcg").cast("double").alias("_sidcg"),
            F.sum("_ap").cast("double").alias("_sap"),
            F.min(
                F.when(F.col("_hit") == 1, F.col("_i"))
            ).alias("_first_hit"),
        )
        ndcg = F.when(
            F.col("_sidcg") > 0,
            F.round(F.col("_sdcg") / F.col("_sidcg"), 6),
        )
        rr = F.when(
            F.col("_first_hit").isNotNull(),
            F.lit(1.0) / F.col("_first_hit").cast("double"),
        )
        ap = F.when(
            F.col("n_rel") > 0,
            F.round(F.col("_sap") / F.col("n_rel").cast("double"), 6),
        )
        return agg.select(
            query_col,
            "n_docs",
            "n_rel",
            ndcg.alias(f"ndcg_{k}"),
            rr.alias("rr"),
            ap.alias("ap"),
        )

    return _t
