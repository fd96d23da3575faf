"""Round-13 series operators (arch_lm, granger_f, hurst_aggvar)
against plain-Python references on small fixtures."""

from __future__ import annotations

import math
import random

import pytest


def _arch_lm_ref(xs):
    mu = sum(xs) / len(xs)
    g = [(x - mu) ** 2 for x in xs]
    pairs = list(zip(g[:-1], g[1:]))  # (g_{t-1}, g_t)
    n = len(pairs)
    sx = sum(p[0] for p in pairs)
    sg = sum(p[1] for p in pairs)
    sxx = sum(p[0] ** 2 for p in pairs)
    sgg = sum(p[1] ** 2 for p in pairs)
    sxg = sum(p[0] * p[1] for p in pairs)
    dx = n * sxx - sx * sx
    dg = n * sgg - sg * sg
    if dx <= 0 or dg <= 0:
        return n, None, None
    r2 = (n * sxg - sx * sg) ** 2 / (dx * dg)
    return n, r2, (n * r2 if n > 2 else None)


def test_arch_lm_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import arch_lm

    rng = random.Random(7)
    # volatility-clustered series: variance doubles mid-way
    xs = [rng.gauss(0, 1) for _ in range(40)] + [
        rng.gauss(0, 4) for _ in range(40)
    ]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    got = df.transform(
        arch_lm("v", partition_by="g", order_by=("ts",))
    ).collect()[0]
    n, r2, lm = _arch_lm_ref(xs)
    assert got.n_pairs == n
    assert got.r2_aux == pytest.approx(r2, abs=2e-6)
    assert got.lm == pytest.approx(lm, abs=2e-4)
    assert got.lm > 3.84  # clustered fixture rejects homoscedasticity


def test_arch_lm_tie_break_deterministic(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import arch_lm

    rows = [("a", 0, i, float(i % 3)) for i in range(20)]
    df = spark.createDataFrame(
        rows, "g string, ts long, eid long, v double"
    )  # ALL timestamps tie -> order must come from eid
    a = df.transform(
        arch_lm("v", partition_by="g", order_by=("ts", "eid"))
    ).collect()
    b = df.orderBy("v").transform(
        arch_lm("v", partition_by="g", order_by=("ts", "eid"))
    ).collect()
    assert a == b and a[0].lm is not None


def _granger_ref(ys, xs):
    pairs = [
        (ys[t], ys[t - 1], xs[t - 1]) for t in range(1, len(ys))
    ]
    n = len(pairs)
    import statistics as st

    y = [p[0] for p in pairs]
    z1 = [p[1] for p in pairs]
    z2 = [p[2] for p in pairs]
    my, m1, m2 = (sum(v) / n for v in (y, z1, z2))
    cyy = sum((a - my) ** 2 for a in y)
    c11 = sum((a - m1) ** 2 for a in z1)
    c22 = sum((a - m2) ** 2 for a in z2)
    c12 = sum((a - m1) * (b - m2) for a, b in zip(z1, z2))
    c1y = sum((a - m1) * (b - my) for a, b in zip(z1, y))
    c2y = sum((a - m2) * (b - my) for a, b in zip(z2, y))
    det = c11 * c22 - c12 * c12
    b = (c1y * c22 - c2y * c12) / det
    c = (c2y * c11 - c1y * c12) / det
    sse_u = cyy - b * c1y - c * c2y
    sse_r = cyy - c1y * c1y / c11
    return n, sse_r, sse_u, (sse_r - sse_u) * (n - 3) / sse_u


def test_granger_matches_python_and_detects_lead(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import granger_f

    rng = random.Random(11)
    xs = [rng.gauss(0, 1) for _ in range(60)]
    # y follows x with one step of lag -> x Granger-causes y
    ys = [0.0] + [0.8 * xs[t - 1] + rng.gauss(0, 0.3) for t in range(1, 60)]
    rows = [(t, ys[t], xs[t]) for t in range(60)]
    df = spark.createDataFrame(rows, "t long, y double, x double")
    got = df.transform(granger_f("y", "x", "t")).collect()[0]
    n, sse_r, sse_u, f = _granger_ref(ys, xs)
    assert got.n == n
    assert got.sse_r == pytest.approx(sse_r, abs=1e-5)
    assert got.sse_u == pytest.approx(sse_u, abs=1e-5)
    assert got.f_stat == pytest.approx(f, rel=1e-5)
    assert got.f_stat > 4.0  # the planted lead is detected
    # reversed direction: y does NOT help forecast x
    rev = df.transform(granger_f("x", "y", "t")).collect()[0]
    assert rev.f_stat < got.f_stat


def _hurst_ref(xs, ms=(2, 4, 8)):
    vs = []
    for m in ms:
        k = len(xs) // m
        means = [sum(xs[i * m:(i + 1) * m]) / m for i in range(k)]
        mu = sum(means) / k
        vs.append(sum((a - mu) ** 2 for a in means) / (k - 1))
    return vs, 1.0 + math.log(vs[2] / vs[0]) / (2 * math.log(ms[2] / ms[0]))


def test_hurst_matches_python_and_separates_regimes(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        hurst_aggvar,
    )

    rng = random.Random(13)
    white = [rng.gauss(0, 1) for _ in range(512)]
    # persistent series: a random walk has H ~ 1 under agg-var
    walk, acc = [], 0.0
    for _ in range(512):
        acc += rng.gauss(0, 1)
        walk.append(acc)
    rows = [("w", i, v) for i, v in enumerate(white)] + [
        ("p", i, v) for i, v in enumerate(walk)
    ]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    got = {
        r.g: r
        for r in df.transform(
            hurst_aggvar("v", (2, 4, 8), "g", ("ts",))
        ).collect()
    }
    vs_w, h_w = _hurst_ref(white)
    vs_p, h_p = _hurst_ref(walk)
    assert got["w"].hurst == pytest.approx(h_w, abs=2e-6)
    assert got["p"].hurst == pytest.approx(h_p, abs=2e-6)
    assert got["w"].v_m2 == pytest.approx(vs_w[0], abs=1e-5)
    assert abs(h_w - 0.5) < 0.2       # white noise -> H near 0.5
    assert h_p > 0.8                  # random walk -> persistent
    assert got["w"].n == 512


def test_hurst_validates_and_short_series_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        hurst_aggvar,
    )

    with pytest.raises(ValueError, match="divide"):
        hurst_aggvar("v", (2, 3, 8))
    with pytest.raises(ValueError, match="geometrically"):
        hurst_aggvar("v", (2, 4, 16))
    rows = [("a", i, float(i)) for i in range(9)]  # one 8-block only
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = df.transform(hurst_aggvar("v", (2, 4, 8), "g", ("ts",)))
    row = out.collect()[0]
    assert row.hurst is None and row.v_m8 is None
