"""Semantic tests for McNemar's paired model comparison and the
distinct-n-gram diversity metric."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def test_mcnemar_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import mcnemar_test

    rng = random.Random(79)
    rows = []
    for _ in range(2000):
        truth = rng.random()
        ca = rng.random() < 0.75
        cb = rng.random() < 0.65
        rows.append(("g", ca, cb))
    df = spark.createDataFrame(rows, "g string, ca boolean, cb boolean")
    r = df.transform(
        mcnemar_test(F.col("ca"), F.col("cb"), partition_by="g")
    ).collect()[0]
    b = sum(1 for _, a, bb in rows if a and not bb)
    c = sum(1 for _, a, bb in rows if not a and bb)
    both = sum(1 for _, a, bb in rows if a and bb)
    assert r["n"] == 2000 and r["n_both"] == both
    assert r["b"] == b and r["c"] == c
    assert r["chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=1e-5)
    # the planted 10-point gap must be visible (chi2 well above 3.84)
    assert r["chi2"] > 10


def test_mcnemar_identical_models_zero(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import mcnemar_test

    rows = [("g", i % 2 == 0, i % 2 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, ca boolean, cb boolean")
    r = df.transform(
        mcnemar_test(F.col("ca"), F.col("cb"), partition_by="g")
    ).collect()[0]
    # no discordant pairs → NULL (test undefined), not 0
    assert r["b"] == 0 and r["c"] == 0 and r["chi2"] is None

    # symmetric discordance → chi2 = 0
    rows2 = [("g", True, False)] * 5 + [("g", False, True)] * 5
    df2 = spark.createDataFrame(rows2, "g string, ca boolean, cb boolean")
    r2 = df2.transform(
        mcnemar_test(F.col("ca"), F.col("cb"), partition_by="g")
    ).collect()[0]
    assert r2["chi2"] == 0.0


def test_ngram_diversity_hand_checked(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import ngram_diversity

    docs = [
        ("g", "the cat sat"),          # unigrams: the cat sat
        ("g", "the cat ran"),          # 'the','cat' repeat
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    r = df.transform(
        ngram_diversity("text", group_by="g", ns=(1, 2))
    ).collect()[0]
    # 6 unigram occurrences, 4 types (the, cat, sat, ran)
    assert r["tokens"] == 6
    assert r["distinct_1"] == pytest.approx(4 / 6, abs=1e-6)
    # bigrams: 'the cat' x2, 'cat sat', 'cat ran' → 3 types / 4 occ
    assert r["distinct_2"] == pytest.approx(3 / 4, abs=1e-6)


def test_ngram_diversity_degenerate_and_bounds(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import ngram_diversity

    # fully repetitive corpus → distinct ratios near zero
    rep = [("g", "spam spam spam spam spam")] * 10
    df = spark.createDataFrame(rep, "g string, text string")
    r = df.transform(
        ngram_diversity("text", group_by="g", ns=(1, 2))
    ).collect()[0]
    assert r["distinct_1"] == pytest.approx(1 / 50, abs=1e-6)
    assert r["distinct_2"] == pytest.approx(1 / 40, abs=1e-6)

    # single-token docs → no bigrams → distinct_2 NULL
    one = [("g", "word")] * 3
    df2 = spark.createDataFrame(one, "g string, text string")
    r2 = df2.transform(
        ngram_diversity("text", group_by="g", ns=(1, 2))
    ).collect()[0]
    assert r2["distinct_1"] == pytest.approx(1 / 3, abs=1e-6)
    assert r2["distinct_2"] is None

    # all-unique corpus → ratios exactly 1
    uniq = [("g", "alpha beta gamma delta")]
    df3 = spark.createDataFrame(uniq, "g string, text string")
    r3 = df3.transform(
        ngram_diversity("text", group_by="g", ns=(1, 2))
    ).collect()[0]
    assert r3["distinct_1"] == 1.0 and r3["distinct_2"] == 1.0


def test_ngram_diversity_hll_close_to_exact(spark):
    """The b=12 HLL path must land within a few standard errors
    (~1.6% at b=12) of the exact type counts, and the exact
    occurrence arithmetic must equal the exact path's totals."""
    from btc_usdt_etl_pipeline_spark.operators.text import (
        ngram_diversity,
    )

    # 400 docs, ~3.2k distinct unigram types via numbered words
    rows = [
        (i % 4, " ".join(f"w{(i * 17 + j) % 3200}" for j in range(30)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g int, text string")
    exact = {
        r["g"]: r
        for r in df.transform(
            ngram_diversity("text", group_by="g", ns=(1, 2))
        ).collect()
    }
    approx = {
        r["g"]: r
        for r in df.transform(
            ngram_diversity(
                "text", group_by="g", ns=(1, 2), approximate=True, b=12
            )
        ).collect()
    }
    assert set(exact) == set(approx)
    for g, a in approx.items():
        e = exact[g]
        assert a["tokens"] == e["tokens"]
        # exact occurrence arithmetic: occ_1 = tokens, occ_2 = tokens - docs
        assert a["occ_1"] == e["tokens"]
        exact_types_1 = round(e["distinct_1"] * a["occ_1"])
        assert a["types_est_1"] == pytest.approx(
            exact_types_1, rel=0.06
        )
        assert a["distinct_1"] == pytest.approx(
            e["distinct_1"], rel=0.06
        )
        assert a["distinct_2"] == pytest.approx(
            e["distinct_2"], rel=0.06
        )


def test_ngram_diversity_hll_ungrouped_and_bounds(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import (
        ngram_diversity,
    )

    df = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha beta",)], "text string"
    )
    out = df.transform(
        ngram_diversity("text", ns=(1,), approximate=True, b=10)
    ).collect()
    assert len(out) == 1
    assert out[0]["tokens"] == 5
    assert out[0]["occ_1"] == 5
    # 3 distinct types; HLL at this cardinality is linear-counting exact
    assert out[0]["types_est_1"] == pytest.approx(3.0, abs=0.01)
    with pytest.raises(ValueError):
        ngram_diversity("text", approximate=True, b=2)
