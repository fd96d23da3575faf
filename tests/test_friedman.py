"""Semantic tests for the Friedman test (Conover squared-rank form):
scipy-free python reference with ties, the no-ties equivalence with
the classic chi-square formula, planted-shift detection, and the
complete-block drop."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F


def _friedman_conover_py(blocks):
    """blocks: dict item -> dict treatment -> value."""
    k = len(next(iter(blocks.values())))
    n = len(blocks)
    rj = defaultdict(float)
    a = 0.0
    for vals in blocks.values():
        ordered = sorted(vals.values())
        for tr, v in vals.items():
            lo = ordered.index(v) + 1
            hi = len(ordered) - ordered[::-1].index(v)
            r = (lo + hi) / 2.0
            rj[tr] += r
            a += r * r
    srj2 = sum(x * x for x in rj.values())
    base_num = n * n * k * (k + 1) ** 2 / 4.0
    base_den = n * k * (k + 1) ** 2 / 4.0
    den = a - base_den
    if den <= 0:
        return None
    return (k - 1) * (srj2 - base_num) / den


def test_friedman_matches_python_reference_with_ties(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import friedman_test

    rng = random.Random(107)
    rows = []
    blocks = {}
    for it in range(300):
        base = rng.uniform(0, 50)
        vals = {
            "a": round(base + rng.uniform(0, 3), 0),   # rounding → ties
            "b": round(base + 1.0 + rng.uniform(0, 3), 0),
            "c": round(base + rng.uniform(0, 3), 0),
        }
        blocks[it] = vals
        rows += [("g", it, tr, v) for tr, v in vals.items()]
    df = spark.createDataFrame(
        rows, "g string, item long, tr string, v double"
    )
    r = df.transform(
        friedman_test("item", "tr", "v", ["a", "b", "c"],
                      partition_by="g")
    ).collect()[0]
    want = _friedman_conover_py(blocks)
    assert r["n_items"] == 300 and r["k"] == 3
    assert r["t_stat"] == pytest.approx(want, abs=1e-4)
    assert r["t_stat"] > 6.0  # planted +1 shift on b is detectable


def test_friedman_no_ties_equals_classic_formula(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import friedman_test

    rng = random.Random(109)
    rows = []
    rj = defaultdict(float)
    n, k = 120, 4
    for it in range(n):
        vals = rng.sample(range(1000), k)  # distinct → no ties
        for j, tr in enumerate("abcd"):
            rows.append(("g", it, tr, float(vals[j])))
        order = sorted(range(k), key=lambda j: vals[j])
        for pos, j in enumerate(order):
            rj["abcd"[j]] += pos + 1
    df = spark.createDataFrame(
        rows, "g string, item long, tr string, v double"
    )
    r = df.transform(
        friedman_test("item", "tr", "v", list("abcd"), partition_by="g")
    ).collect()[0]
    classic = 12.0 / (n * k * (k + 1)) * sum(
        x * x for x in rj.values()
    ) - 3 * n * (k + 1)
    # without ties Conover's T equals the classic chi-square statistic
    assert r["t_stat"] == pytest.approx(classic, abs=1e-4)


def test_friedman_drops_incomplete_and_degenerate(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import friedman_test

    rows = [("g", i, tr, float(i * 3 + j))
            for i in range(20) for j, tr in enumerate("ab")]
    rows += [("g", 100, "a", 1.0)]  # incomplete item
    df = spark.createDataFrame(
        rows, "g string, item long, tr string, v double"
    )
    r = df.transform(
        friedman_test("item", "tr", "v", ["a", "b"], partition_by="g")
    ).collect()[0]
    assert r["n_items"] == 20 and r["n_dropped"] == 1

    # every item fully tied → zero denominator → NULL
    tied = [("g", i, tr, 7.0) for i in range(10) for tr in "ab"]
    df2 = spark.createDataFrame(
        tied, "g string, item long, tr string, v double"
    )
    r2 = df2.transform(
        friedman_test("item", "tr", "v", ["a", "b"], partition_by="g")
    ).collect()[0]
    assert r2["t_stat"] is None
