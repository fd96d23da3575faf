"""Semantic tests for feature hashing, robust scaling, and RRF fusion:
hand-computed references and the structural invariants (collision
linearity, outlier resistance, fusion ordering) that define each op."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_feature_hash_is_additive_in_tokens(spark):
    """hash(doc with tokens A+B) == hash(A-only) + hash(B-only):
    the vectorizer is a linear map on token multisets."""
    from btc_usdt_etl_pipeline_spark.ml.features import feature_hash

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha"),
            (3, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["features"]
        for r in df.transform(feature_hash("text", "doc_id", dims=16)).collect()
    }
    assert [a + b for a, b in zip(rows[2], rows[3])] == rows[1]
    assert sum(abs(v) for v in rows[1]) <= 3  # three tokens, signs ±1


def test_feature_hash_repeated_token_counts(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import feature_hash

    df = spark.createDataFrame(
        [(1, "x x x x")], "doc_id long, text string"
    )
    (row,) = df.transform(feature_hash("text", "doc_id", dims=16)).collect()
    nonzero = [v for v in row["features"] if v != 0]
    assert nonzero in ([4], [-4])  # one bucket, magnitude 4


def test_robust_scale_ignores_gross_outlier(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import robust_scale

    vals = [float(i) for i in range(1, 100)] + [1e9]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        "i long, k string, value double",
    )
    out = df.transform(robust_scale("value", group_by="k")).collect()
    by_v = {r["value"]: r["scaled"] for r in out}
    # median 50.5, IQR ~49.5: interior points stay O(1), the outlier
    # is huge but does not distort anyone else's scale.
    assert abs(by_v[50.0] - (50.0 - 50.5) / 49.5) < 1e-9
    assert abs(by_v[1.0]) < 1.1 and abs(by_v[99.0]) < 1.1
    assert by_v[1e9] > 1e6


def test_robust_scale_constant_group_is_zero(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import robust_scale

    df = spark.createDataFrame(
        [(i, "c", 7.0) for i in range(10)],
        "i long, k string, value double",
    )
    out = df.transform(robust_scale("value", group_by="k")).collect()
    assert all(r["scaled"] == 0.0 for r in out)


def test_rrf_fusion_matches_hand_computation(spark):
    from btc_usdt_etl_pipeline_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rnk int"
    )
    out = rrf_fuse([r1, r2], top_n=4).collect()
    got = [(r["rank"], r["doc_id"]) for r in out]
    score = {
        10: 1 / 61 + 1 / 63,
        20: 1 / 62 + 1 / 61,
        30: 1 / 63,
        40: 1 / 62,
    }
    want_order = sorted(score, key=lambda d: (-round(score[d], 10), d))
    assert got == list(enumerate(want_order, start=1))
    by_doc = {r["doc_id"]: r["rrf_score"] for r in out}
    assert abs(by_doc[20] - score[20]) < 1e-9
    # doc in both lists beats docs in one: 20 and 10 lead.
    assert [d for _, d in got[:2]] == [20, 10]
