"""Semantic tests for Cochran's Q (k-model complete-block comparison)
and Good–Turing unseen-mass estimation."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F


def _cochran_py(items):
    """items: dict item -> dict treatment -> 0/1 (complete only)."""
    k = len(next(iter(items.values())))
    t = sum(sum(v.values()) for v in items.values())
    sli2 = sum(sum(v.values()) ** 2 for v in items.values())
    gj = Counter()
    for v in items.values():
        for tr, s in v.items():
            gj[tr] += s
    sgj2 = sum(g * g for g in gj.values())
    den = k * t - sli2
    if den <= 0:
        return None
    return (k - 1) * (k * sgj2 - t * t) / den


def test_cochran_q_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import cochran_q

    rng = random.Random(83)
    rows = []
    blocks = defaultdict(dict)
    accs = {"m0": 0.8, "m1": 0.7, "m2": 0.55}
    for it in range(400):
        for tr, acc in accs.items():
            s = rng.random() < acc
            rows.append(("g", it, tr, s))
            blocks[it][tr] = int(s)
    # incomplete items must be dropped
    rows += [("g", 9000 + i, "m0", True) for i in range(7)]
    df = spark.createDataFrame(
        rows, "g string, item long, tr string, s boolean"
    )
    r = df.transform(
        cochran_q("item", "tr", F.col("s"), ["m0", "m1", "m2"],
                  partition_by="g")
    ).collect()[0]
    want = _cochran_py(blocks)
    assert r["n_items"] == 400 and r["n_dropped"] == 7 and r["k"] == 3
    assert r["q_stat"] == pytest.approx(want, abs=1e-4)
    assert r["q_stat"] > 20  # planted 25-point spread is detectable


def test_cochran_q_reduces_to_mcnemar_shape(spark):
    """For k = 2, Q equals McNemar's (b−c)²/(b+c) exactly."""
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        cochran_q,
        mcnemar_test,
    )

    rng = random.Random(89)
    pairs = [(rng.random() < 0.7, rng.random() < 0.5) for _ in range(300)]
    long_rows = []
    wide_rows = []
    for i, (a, b) in enumerate(pairs):
        long_rows += [("g", i, "a", a), ("g", i, "b", b)]
        wide_rows.append(("g", a, b))
    dfl = spark.createDataFrame(
        long_rows, "g string, item long, tr string, s boolean"
    )
    q = dfl.transform(
        cochran_q("item", "tr", F.col("s"), ["a", "b"], partition_by="g")
    ).collect()[0]["q_stat"]
    dfw = spark.createDataFrame(
        wide_rows, "g string, ca boolean, cb boolean"
    )
    m = dfw.transform(
        mcnemar_test(F.col("ca"), F.col("cb"), partition_by="g")
    ).collect()[0]["chi2"]
    assert q == pytest.approx(m, abs=1e-6)


def test_cochran_q_degenerate_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import cochran_q

    # all successes everywhere → denominator 0 → NULL
    rows = [("g", i, tr, True) for i in range(10) for tr in ("a", "b")]
    df = spark.createDataFrame(
        rows, "g string, item long, tr string, s boolean"
    )
    r = df.transform(
        cochran_q("item", "tr", F.col("s"), ["a", "b"], partition_by="g")
    ).collect()[0]
    assert r["q_stat"] is None and r["t"] == 20


def test_good_turing_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import good_turing

    rng = random.Random(97)
    # zipf-ish counts with plenty of singletons
    counts = [max(1, int(rng.paretovariate(1.2))) for _ in range(500)]
    rows = [("g", f"t{i}", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "g string, tok string, cnt long")
    r = df.transform(good_turing("cnt", group_by="g", max_r=3)).collect()[0]
    fof = Counter(counts)
    n = sum(counts)
    assert r["n_types"] == 500 and r["n_tokens"] == n
    assert r["p_unseen"] == pytest.approx(fof[1] / n, abs=1e-6)
    for rr in (1, 2, 3):
        want = (
            (rr + 1) * fof[rr + 1] / fof[rr] if fof[rr] > 0 else None
        )
        got = r[f"r_star_{rr}"]
        if want is None:
            assert got is None
        else:
            assert got == pytest.approx(want, abs=1e-5)


def test_good_turing_no_singletons(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import good_turing

    rows = [("g", "a", 5), ("g", "b", 5), ("g", "c", 2)]
    df = spark.createDataFrame(rows, "g string, tok string, cnt long")
    r = df.transform(good_turing("cnt", group_by="g")).collect()[0]
    assert r["p_unseen"] == 0.0  # no singletons → estimated unseen 0
    assert r["r_star_1"] is None  # n1 = 0 → undefined
    assert r["r_star_2"] == pytest.approx(3 * 0 / 1, abs=1e-9) or (
        r["r_star_2"] == 0.0
    )
