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
