"""Semantic tests for the two-sample log-rank test: python reference
on random censored data, planted-acceleration detection, identical-arm
null behavior, and degenerate fences."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F


def _logrank_py(subjects):
    """subjects: (dur, is_a, event). Returns (o1, e1, v, chi2)."""
    per_t = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d2, c2
    for dur, a, ev in subjects:
        idx = (0 if ev else 1) if a else (2 if ev else 3)
        per_t[dur][idx] += 1
    times = sorted(per_t)
    n1 = sum(1 for _, a, _ in subjects if a)
    n2 = len(subjects) - n1
    o1 = e1 = v = 0.0
    r1, r2 = n1, n2
    for t in times:
        d1, c1, d2, c2 = per_t[t]
        dt = d1 + d2
        nt = r1 + r2
        if dt > 0 and nt > 0:
            frac = r1 / nt
            e1 += round(dt * frac, 6)
            if nt > 1:
                v += round(
                    dt * frac * (1 - frac) * ((nt - dt) / (nt - 1)), 6
                )
        o1 += d1
        r1 -= d1 + c1
        r2 -= d2 + c2
    chi2 = (o1 - e1) ** 2 / v if v > 0 else None
    return o1, e1, v, chi2


def test_log_rank_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import log_rank_test

    rng = random.Random(139)
    subjects = []
    for i in range(600):
        a = i % 2 == 0
        # arm A events come faster (planted hazard ratio)
        dur = rng.randint(1, 15 if a else 30)
        ev = rng.random() < 0.75
        subjects.append((dur, a, ev))
    df = spark.createDataFrame(
        [("g", d, a, e) for d, a, e in subjects],
        "g string, dur int, a boolean, ev boolean",
    )
    r = df.transform(
        log_rank_test("dur", F.col("ev"), F.col("a"), group_by="g")
    ).collect()[0]
    o1, e1, v, chi2 = _logrank_py(subjects)
    assert r["n_a"] == 300 and r["n_b"] == 300
    assert r["o_a"] == o1
    assert r["e_a"] == pytest.approx(e1, abs=1e-4)
    assert r["chi2"] == pytest.approx(chi2, rel=1e-4)
    assert r["chi2"] > 10  # planted acceleration is detectable
    assert r["rate_ratio"] > 1.0  # A's observed/expected exceeds B's


def test_log_rank_identical_arms_near_zero(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import log_rank_test

    # literally mirrored arms → O1 = E1 exactly → chi2 = 0
    subjects = []
    rng = random.Random(149)
    for _ in range(200):
        dur = rng.randint(1, 20)
        ev = rng.random() < 0.7
        subjects.append((dur, True, ev))
        subjects.append((dur, False, ev))
    df = spark.createDataFrame(
        [("g", d, a, e) for d, a, e in subjects],
        "g string, dur int, a boolean, ev boolean",
    )
    r = df.transform(
        log_rank_test("dur", F.col("ev"), F.col("a"), group_by="g")
    ).collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert r["rate_ratio"] == pytest.approx(1.0, abs=1e-6)


def test_log_rank_one_arm_empty_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import log_rank_test

    rows = [("g", i, True, True) for i in range(1, 10)]
    df = spark.createDataFrame(
        rows, "g string, dur int, a boolean, ev boolean"
    )
    r = df.transform(
        log_rank_test("dur", F.col("ev"), F.col("a"), group_by="g")
    ).collect()[0]
    assert r["n_b"] == 0 and r["chi2"] is None
