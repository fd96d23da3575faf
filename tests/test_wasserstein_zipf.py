"""Semantic tests for 1-D Wasserstein drift and the Zipf vocabulary
fit: scipy-free Python references, shift-sensitivity (the property KS
lacks), and the planted power-law recovery."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _w1_py(ref, cur):
    vals = sorted(set(ref) | set(cur))
    cr = cc = 0.0
    rref = Counter(ref)
    rcur = Counter(cur)
    out = 0.0
    for v, nv in zip(vals, vals[1:] + [None]):
        cr += rref.get(v, 0)
        cc += rcur.get(v, 0)
        if nv is not None:
            out += abs(cr / len(ref) - cc / len(cur)) * (nv - v)
    return out


def test_wasserstein_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.drift import wasserstein_1d

    rng = random.Random(41)
    ref = [round(rng.gauss(10, 2), 3) for _ in range(400)]
    cur = [round(rng.gauss(11, 2.5), 3) for _ in range(300)]
    rows = [("g", v, False) for v in ref] + [("g", v, True) for v in cur]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    r = df.transform(
        wasserstein_1d("v", F.col("cur"), group_by="g")
    ).collect()[0]
    assert r["n_ref"] == 400 and r["n_cur"] == 300
    assert r["w1"] == pytest.approx(_w1_py(ref, cur), abs=1e-3)


def test_wasserstein_shift_sensitivity_vs_ks(spark):
    """A uniform +d shift: KS saturates on disjoint supports while W1
    keeps growing linearly with d — the reason W1 exists here."""
    from btc_usdt_etl_pipeline_spark.operators.drift import (
        ks_statistic,
        wasserstein_1d,
    )

    base = [i / 10.0 for i in range(100)]
    for shift, want in [(20.0, 20.0), (40.0, 40.0)]:
        rows = [("g", v, False) for v in base] + [
            ("g", v + shift, True) for v in base
        ]
        df = spark.createDataFrame(rows, "g string, v double, cur boolean")
        w = df.transform(
            wasserstein_1d("v", F.col("cur"), group_by="g")
        ).collect()[0]["w1"]
        k = df.transform(
            ks_statistic("v", F.col("cur"), group_by="g")
        ).collect()[0]["ks"]
        assert k == pytest.approx(1.0, abs=1e-9)  # saturated
        assert w == pytest.approx(want, abs=0.2)  # keeps growing


def test_wasserstein_identical_zero_and_empty_side_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.drift import wasserstein_1d

    same = [("g", float(v), b) for v in range(20) for b in (True, False)]
    df = spark.createDataFrame(same, "g string, v double, cur boolean")
    r = df.transform(
        wasserstein_1d("v", F.col("cur"), group_by="g")
    ).collect()[0]
    assert r["w1"] == pytest.approx(0.0, abs=1e-9)

    onesided = [("g", float(v), False) for v in range(5)]
    df2 = spark.createDataFrame(onesided, "g string, v double, cur boolean")
    r2 = df2.transform(
        wasserstein_1d("v", F.col("cur"), group_by="g")
    ).collect()[0]
    assert r2["w1"] is None and r2["n_cur"] == 0


# ---------------------------------------------------------------- zipf
def test_zipf_fit_recovers_planted_power_law(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import zipf_fit

    # counts = round(10000 / rank^0.8) — a clean planted power law
    rows = [
        ("g", f"t{r}", int(round(10000 / r**0.8)))
        for r in range(1, 81)
    ]
    df = spark.createDataFrame(rows, "g string, tok string, cnt long")
    r = df.transform(zipf_fit("cnt", group_by="g", top_r=100)).collect()[0]
    assert r["n_terms"] == 80
    assert r["slope"] == pytest.approx(-0.8, abs=0.02)
    assert r["r2"] > 0.999
    assert r["intercept"] == pytest.approx(math.log(10000), abs=0.05)


def test_zipf_fit_matches_closed_form_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import zipf_fit

    rng = random.Random(43)
    counts = sorted(
        (rng.randint(1, 5000) for _ in range(60)), reverse=True
    )
    rows = [("g", f"w{i}", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "g string, tok string, cnt long")
    r = df.transform(zipf_fit("cnt", group_by="g", top_r=50)).collect()[0]
    xs = [math.log(i + 1) for i in range(50)]
    ys = [math.log(c) for c in counts[:50]]
    n = 50.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert r["n_terms"] == 50
    assert r["slope"] == pytest.approx(slope, abs=1e-4)
    assert r["r2"] == pytest.approx(r2, abs=1e-4)


def test_zipf_fit_degenerate_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import zipf_fit

    # two terms → n_terms < 3 → NULLs
    rows = [("g", "a", 10), ("g", "b", 5)]
    df = spark.createDataFrame(rows, "g string, tok string, cnt long")
    r = df.transform(zipf_fit("cnt", group_by="g")).collect()[0]
    assert r["n_terms"] == 2 and r["slope"] is None and r["r2"] is None
