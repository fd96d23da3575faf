"""Round-13 finance diagnostics (variance_ratio, bar_volatility,
amihud_illiquidity, engle_granger) against plain-Python references."""

from __future__ import annotations

import math
import random

import pytest


def _vr_ref(xs, q=4):
    d1 = [xs[t] - xs[t - 1] for t in range(1, len(xs))]
    dq = [xs[t] - xs[t - q] for t in range(q, len(xs))]
    n1, nq = len(d1), len(dq)
    mu = sum(d1) / n1
    var1 = sum((d - mu) ** 2 for d in d1) / (n1 - 1)
    varq = sum((d - q * mu) ** 2 for d in dq) / (q * nq)
    vr = varq / var1
    z = (vr - 1.0) / math.sqrt((2 * (2 * q - 1) * (q - 1) / (3 * q)) / n1)
    return vr, z


def test_variance_ratio_matches_python_and_separates(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        variance_ratio,
    )

    rng = random.Random(17)
    walk, acc = [], 100.0
    for _ in range(400):
        acc += rng.gauss(0, 1)
        walk.append(acc)
    # mean-reverting series: strong pull back to 100
    mr, lvl = [], 100.0
    for _ in range(400):
        lvl = 100.0 + 0.2 * (lvl - 100.0) + rng.gauss(0, 1)
        mr.append(lvl)
    rows = [("w", i, v) for i, v in enumerate(walk)] + [
        ("m", i, v) for i, v in enumerate(mr)
    ]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    got = {
        r.g: r
        for r in df.transform(
            variance_ratio("v", 4, "g", ("ts",))
        ).collect()
    }
    for key, xs in (("w", walk), ("m", mr)):
        vr, z = _vr_ref(xs)
        assert got[key].vr == pytest.approx(vr, abs=2e-6)
        assert got[key].z == pytest.approx(z, abs=2e-6)
    assert abs(got["w"].vr - 1.0) < 0.35      # random walk ~ 1
    assert got["m"].vr < 0.6                  # mean reversion << 1
    assert got["m"].z < -3.0


def test_variance_ratio_validates_and_short_series(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        variance_ratio,
    )

    with pytest.raises(ValueError, match="q must"):
        variance_ratio("v", q=1)
    rows = [("a", i, float(i)) for i in range(4)]  # n=4 -> no q=4 diff
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    row = df.transform(variance_ratio("v", 4, "g", ("ts",))).collect()[0]
    assert row.vr is None and row.z is None


def test_bar_volatility_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.resample import (
        bar_volatility,
    )

    rng = random.Random(23)
    rows = []
    prices = {}
    for i in range(200):
        day = i % 4
        p = abs(rng.gauss(100, 5)) + 1.0
        rows.append(("a", day * 86_400_000 + i, i, p))
        prices.setdefault(day, []).append(p)
    df = spark.createDataFrame(
        rows, "g string, ts long, eid long, v double"
    )
    got = {
        r.bar: r
        for r in df.withColumn(
            "ts", (df.ts / 1000).cast("timestamp")
        ).transform(
            bar_volatility(
                "v", "ts", "g", "day", tie_cols=("eid",)
            )
        ).collect()
    }
    assert len(got) == 4
    for bar, r in got.items():
        ps = prices[bar.day - 1]  # date_trunc day-of-month is 1-based
        o, c, h, l = ps[0], ps[-1], max(ps), min(ps)
        assert (r.open, r.close, r.high, r.low) == (o, c, h, l)
        pk = math.log(h / l) ** 2 / (4 * math.log(2))
        gk = 0.5 * math.log(h / l) ** 2 - (
            2 * math.log(2) - 1
        ) * math.log(c / o) ** 2
        rs = math.log(h / c) * math.log(h / o) + math.log(
            l / c
        ) * math.log(l / o)
        assert r.pk == pytest.approx(pk, abs=2e-6)
        assert r.gk == pytest.approx(gk, abs=2e-6)
        assert r.rs == pytest.approx(rs, abs=2e-6)
        assert r.pk >= 0 and r.rs >= -1e-9  # RS nonneg up to rounding


def test_amihud_matches_python_and_ranks_liquidity(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        amihud_illiquidity,
    )

    rng = random.Random(29)
    rows = []
    series = {"thin": 1.0, "deep": 100.0}
    closes = {k: {} for k in series}
    vols = {k: {} for k in series}
    for g, scale in series.items():
        for day in range(10):
            for i in range(5):
                v = scale * abs(rng.gauss(10, 2)) + 0.1
                ts = day * 86_400 + i * 60
                rows.append((g, ts, day * 100 + i, v))
                closes[g][day] = v
                vols[g][day] = vols[g].get(day, 0.0) + abs(v)
    df = spark.createDataFrame(
        rows, "g string, ts long, eid long, v double"
    )
    got = {
        r.g: r
        for r in df.withColumn(
            "ts", df.ts.cast("timestamp")
        ).transform(
            amihud_illiquidity(
                "v", "ts", group_by="g", tie_cols=("eid",)
            )
        ).collect()
    }
    for g in series:
        terms = [
            abs(closes[g][d] / closes[g][d - 1] - 1) / vols[g][d]
            for d in range(1, 10)
        ]
        ref = sum(terms) / len(terms)
        assert got[g].n_days == 9
        assert got[g].amihud == pytest.approx(ref, abs=2e-6)
    # same relative moves, 100x the volume -> ~100x more liquid
    assert got["deep"].amihud < got["thin"].amihud / 10


def _eg_ref(ys, xs):
    n = len(ys)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [y - a - b * x for y, x in zip(ys, xs)]
    el = e[:-1]
    de = [e[t] - e[t - 1] for t in range(1, n)]
    sld = sum(l * d for l, d in zip(el, de))
    sll = sum(l * l for l in el)
    sdd = sum(d * d for d in de)
    phi = sld / sll
    se2 = (sdd - phi * sld) / (len(de) - 1) / sll
    return b, phi, phi / math.sqrt(se2)


def test_engle_granger_matches_python_and_detects(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import engle_granger

    rng = random.Random(31)
    # cointegrated pair: x a random walk, y = 2x + stationary noise
    xs, acc = [], 50.0
    for _ in range(120):
        acc += rng.gauss(0, 1)
        xs.append(acc)
    ys = [2.0 * x + rng.gauss(0, 0.5) for x in xs]
    rows = [(t, ys[t], xs[t]) for t in range(120)]
    df = spark.createDataFrame(rows, "t long, y double, x double")
    got = df.transform(engle_granger("y", "x", "t")).collect()[0]
    b, phi, adf = _eg_ref(ys, xs)
    assert got.beta == pytest.approx(b, abs=2e-6)
    assert got.phi == pytest.approx(phi, abs=2e-6)
    assert got.adf_t == pytest.approx(adf, abs=2e-5)
    assert got.beta == pytest.approx(2.0, abs=0.1)
    assert got.adf_t < -5.0  # residual strongly mean-reverting
    # independent walks: residual is itself a walk -> weak adf
    zs, acc2 = [], 50.0
    for _ in range(120):
        acc2 += rng.gauss(0, 1)
        zs.append(acc2)
    rows2 = [(t, zs[t], xs[t]) for t in range(120)]
    df2 = spark.createDataFrame(rows2, "t long, y double, x double")
    got2 = df2.transform(engle_granger("y", "x", "t")).collect()[0]
    assert got2.adf_t > got.adf_t
