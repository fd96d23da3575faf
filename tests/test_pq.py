"""Semantic tests for product quantization: subspace independence,
code determinism, and that near-identical vectors share codes while
far vectors split."""

from __future__ import annotations

import random


def _vecs(seed=23, n=80, dim=8):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # two planted blobs per subspace half
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append(
            (i, [base + rng.uniform(-0.5, 0.5) for _ in range(dim)])
        )
    return rows


def test_pq_codes_separate_planted_blobs(spark):
    from btc_usdt_etl_pipeline_spark.ml.clustering import pq_codes

    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_codes(df, m=2, sub_dim=4, k=2, iters=3).collect()
    by_id = {r["vec_id"]: (r["code_0"], r["code_1"], r["pq_code"]) for r in out}
    evens = {by_id[i] for i in range(0, 80, 2)}
    odds = {by_id[i] for i in range(1, 80, 2)}
    # each blob coherent, blobs disjoint
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    # packed code consistent with parts
    for c0, c1, packed in list(evens) + list(odds):
        assert packed == c0 + 2 * c1


def test_pq_matches_per_subspace_kmeans(spark):
    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.ml.clustering import (
        kmeans_assign,
        pq_codes,
    )

    rng = random.Random(5)
    rows = [(i, [rng.uniform(0, 10) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["code_0"], r["code_1"])
        for r in pq_codes(df, m=2, sub_dim=4, k=3, iters=2).collect()
    }
    for s in range(2):
        sub = df.select(
            "vec_id",
            F.slice("embedding", s * 4 + 1, 4).alias("_sub"),
        )
        ind = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign(
                sub, vec_col="_sub", id_col="vec_id", k=3, iters=2
            ).collect()
        }
        assert all(got[i][s] == ind[i] for i in got)
