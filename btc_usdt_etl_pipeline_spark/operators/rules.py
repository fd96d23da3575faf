"""Market-basket association rule mining (Agrawal et al., SIGMOD'93):
support / confidence / lift over co-occurrence pairs — the classic
"users who bought A also bought B" analytics surface, and in a data
pipeline the standard tool for spotting correlated attributes
(co-occurring tags, template fragments, label leakage pairs).

Scale shape: the pair generation is a basket-keyed self-join, so the
work is Σ|basket|² — quadratic per BASKET (baskets are small by
nature: a receipt, a session, a doc's tag set), never corpus-quadratic.
The `max_basket` fence drops pathological mega-baskets (a basket with
10⁶ items is telemetry noise, not shopping) BEFORE the join, keeping
the blowup bounded exactly like the dedup family's bucket caps.  Item
marginals are a second small aggregation broadcast into the rule
assembly; everything downstream of the pair count runs on pair-level
(vocabulary²-bounded, support-filtered) data.

Determinism: supports and counts are integers; confidence/lift are
single IEEE divisions of integer-valued doubles — bit-stable
cross-engine with no rounding contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    top_k: int = 50,
    max_basket: int = 1000,
) -> DataFrame:
    """Top-``top_k`` rules a→b ranked by lift (desc, then antecedent /
    consequent asc — total order).  Returns ``(rank, antecedent,
    consequent, n_pair, support, confidence, lift)`` where support =
    n_pair/N baskets, confidence = n_pair/n(a), lift =
    confidence/(n(b)/N).  Both directions of every pair are scored
    (confidence is asymmetric)."""
    b = baskets.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()
    sized = b.withColumn(
        "_sz", F.count(F.lit(1)).over(Window.partitionBy("_bk"))
    ).where(F.col("_sz") <= max_basket)
    left = sized.select("_bk", F.col("_it").alias("_a"))
    right = sized.select("_bk", F.col("_it").alias("_b"))
    pairs = (
        left.join(right, "_bk")
        .where(F.col("_a") < F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_np"))
        .where(F.col("_np") >= min_pair_support)
    )
    # Both rule directions from each unordered pair.
    rules = pairs.select(
        F.col("_a").alias("antecedent"),
        F.col("_b").alias("consequent"),
        "_np",
    ).unionByName(
        pairs.select(
            F.col("_b").alias("antecedent"),
            F.col("_a").alias("consequent"),
            "_np",
        )
    )
    # Marginals and the basket total come from `sized` — the SAME
    # post-max_basket population as the pair counts — so
    # support/confidence/lift share one universe.  Computing them from
    # the unfiltered table would systematically understate confidence
    # and lift for items appearing in dropped mega-baskets
    # (n_pair / n(a) with n(a) counting baskets the pairs never saw).
    items = sized.groupBy(F.col("_it")).agg(
        F.count(F.lit(1)).alias("_ni")
    )
    totals = sized.agg(
        F.count_distinct(F.col("_bk")).alias("_nbk")
    )
    # item marginals are vocabulary-scale — broadcast both attaches;
    # the basket total rides in as an in-plan broadcast scalar (no
    # driver action).
    from btc_usdt_etl_pipeline_spark.functions import attach_scalar

    scored = (
        rules.join(
            F.broadcast(items.withColumnRenamed("_it", "antecedent")),
            "antecedent",
        )
        .withColumnRenamed("_ni", "_na")
        .join(
            F.broadcast(items.withColumnRenamed("_it", "consequent")),
            "consequent",
        )
        .withColumnRenamed("_ni", "_nb")
    )
    scored = attach_scalar(scored, totals, F.col("_np"), F.col("_nbk"))
    nn = F.col("_nbk").cast("double")
    support = F.col("_np").cast("double") / nn
    confidence = F.col("_np").cast("double") / F.col("_na").cast("double")
    lift = confidence / (F.col("_nb").cast("double") / nn)
    w = Window.orderBy(
        F.col("lift").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    )
    return (
        scored.select(
            "antecedent",
            "consequent",
            F.col("_np").alias("n_pair"),
            support.alias("support"),
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("antecedent").asc(),
            F.col("consequent").asc(),
        )
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "antecedent",
            "consequent",
            "n_pair",
            "support",
            "confidence",
            "lift",
        )
    )
