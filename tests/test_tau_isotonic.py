"""Semantic tests for Kendall's τ-b (contingency prefix-sum plan) and
exact distributed isotonic calibration (interval-minimax PAV):
brute-force pair-count and pure-python PAV references, plus the
monotonicity / degenerate contracts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- tau-b
def _tau_py(pairs):
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            s = dx * dy
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(c * (c - 1) / 2 for c in Counter(x for x, _ in pairs).values())
    n2 = sum(c * (c - 1) / 2 for c in Counter(y for _, y in pairs).values())
    if n0 - n1 <= 0 or n0 - n2 <= 0:
        return conc, disc, None
    return conc, disc, (conc - disc) / ((n0 - n1) * (n0 - n2)) ** 0.5


def test_kendall_tau_matches_bruteforce(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import kendall_tau_b

    rng = random.Random(31)
    pairs = [
        (rng.randint(0, 5), rng.randint(0, 4) + (1 if rng.random() < 0.4 else 0))
        for _ in range(250)
    ]
    # plant association
    pairs += [(x, min(4, x)) for x in (rng.randint(0, 5) for _ in range(80))]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "g string, x int, y int"
    )
    r = df.transform(kendall_tau_b("x", "y", partition_by="g")).collect()[0]
    conc, disc, tau = _tau_py(pairs)
    assert r["n"] == len(pairs)
    assert r["concordant"] == conc
    assert r["discordant"] == disc
    assert r["tau_b"] == pytest.approx(tau, abs=1e-6)
    assert r["tau_b"] > 0  # planted positive association


def test_kendall_tau_perfect_and_degenerate(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import kendall_tau_b

    # y strictly increasing with x, no ties → tau = 1
    inc = [("g", i, i * 2) for i in range(30)]
    df = spark.createDataFrame(inc, "g string, x int, y int")
    r = df.transform(kendall_tau_b("x", "y", partition_by="g")).collect()[0]
    assert r["tau_b"] == pytest.approx(1.0, abs=1e-9)

    # reversed → -1
    dec = [("g", i, -i) for i in range(30)]
    df2 = spark.createDataFrame(dec, "g string, x int, y int")
    r2 = df2.transform(kendall_tau_b("x", "y", partition_by="g")).collect()[0]
    assert r2["tau_b"] == pytest.approx(-1.0, abs=1e-9)

    # constant x → all x tied → NULL
    const = [("g", 1, i) for i in range(10)]
    df3 = spark.createDataFrame(const, "g string, x int, y int")
    r3 = df3.transform(kendall_tau_b("x", "y", partition_by="g")).collect()[0]
    assert r3["tau_b"] is None and r3["concordant"] == 0


# ------------------------------------------------------------ isotonic
def _pav_py(values, weights):
    """Pool-adjacent-violators on (mean, weight) blocks."""
    blocks = [[v * w, w] for v, w in zip(values, weights)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            s, w = out.pop()
            out[-1][0] += s
            out[-1][1] += w
    fit = []
    for s, w in out:
        fit.extend([s / w] * int(round(w)))
    return fit  # one value per unit weight only if weights integral


def test_isotonic_matches_pav_reference(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import (
        isotonic_calibration,
    )

    rng = random.Random(37)
    rows = []
    for i in range(2000):
        score = rng.random()
        p = min(0.95, max(0.05, score * 0.8 + rng.uniform(-0.15, 0.15)))
        rows.append(("g", score, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "g string, score double, lbl int")
    out = sorted(
        df.transform(
            isotonic_calibration(
                "score", "lbl", lo=0.0, hi=1.0, n_bins=16, group_by="g"
            )
        ).collect(),
        key=lambda r: r["bin"],
    )
    # python reference: same binning, then block PAV
    import math

    width = 1.0 / 16
    agg = {}
    for _, s, l in rows:
        b = min(15, max(0, math.floor(s / width)))
        w, t = agg.get(b, (0, 0))
        agg[b] = (w + 1, t + l)
    bins = sorted(agg)
    means = [agg[b][1] / agg[b][0] for b in bins]
    weights = [agg[b][0] for b in bins]
    # block PAV over bins
    blocks = [[m * w, w, 1] for m, w in zip(means, weights)]
    stack = []
    for b in blocks:
        stack.append(list(b))
        while (
            len(stack) > 1
            and stack[-2][0] / stack[-2][1] > stack[-1][0] / stack[-1][1]
        ):
            s2, w2, c2 = stack.pop()
            stack[-1][0] += s2
            stack[-1][1] += w2
            stack[-1][2] += c2
    want = []
    for s2, w2, c2 in stack:
        want.extend([s2 / w2] * c2)
    got = [r["calibrated"] for r in out]
    assert [r["bin"] for r in out] == bins
    assert got == pytest.approx(want, abs=1e-5)
    # monotone non-decreasing
    for a, b in zip(got, got[1:]):
        assert a <= b + 1e-9
    # rates preserved
    for r, b in zip(out, bins):
        assert r["n"] == agg[b][0]
        assert r["rate"] == pytest.approx(agg[b][1] / agg[b][0], abs=1e-6)


def test_isotonic_already_monotone_is_identity(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import (
        isotonic_calibration,
    )

    # bin rates 0.0, 0.25, 0.5, 1.0 — already isotonic → fit == rate
    rows = []
    for b, rate in [(0, 0.0), (1, 0.25), (2, 0.5), (3, 1.0)]:
        for i in range(16):
            rows.append(("g", (b + 0.5) / 4.0, 1 if i < rate * 16 else 0))
    df = spark.createDataFrame(rows, "g string, score double, lbl int")
    out = df.transform(
        isotonic_calibration(
            "score", "lbl", lo=0.0, hi=1.0, n_bins=4, group_by="g"
        )
    ).collect()
    for r in out:
        assert r["calibrated"] == pytest.approx(r["rate"], abs=1e-9)


def test_isotonic_rejects_oversized_bins(spark):
    from btc_usdt_etl_pipeline_spark.ml.features import (
        isotonic_calibration,
    )

    with pytest.raises(ValueError):
        isotonic_calibration("s", "l", lo=0.0, hi=1.0, n_bins=65)
