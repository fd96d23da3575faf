"""Semantic tests for Mann–Kendall + Sen's slope and the binary-
segmentation changepoint: python references, planted-trend/shift
recovery, and the degenerate fences."""

from __future__ import annotations

import math
import random
import statistics
from collections import Counter

import pytest


def _mk_py(series):
    """series: list of (t, x) with distinct t."""
    s = 0
    slopes = []
    n = len(series)
    pts = sorted(series)
    for i in range(n):
        for j in range(i + 1, n):
            d = pts[j][1] - pts[i][1]
            s += (d > 0) - (d < 0)
            slopes.append(d / (pts[j][0] - pts[i][0]))
    ties = Counter(x for _, x in pts)
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    # exact interpolated (type-7) median of slopes
    sl = sorted(slopes)
    m = len(sl)
    if m % 2:
        sen = sl[m // 2]
    else:
        sen = (sl[m // 2 - 1] + sl[m // 2]) / 2.0
    return s, z, sen


def test_mann_kendall_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import mann_kendall

    rng = random.Random(113)
    series = [(t, 0.4 * t + rng.gauss(0, 2)) for t in range(1, 41)]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in series], "g string, t int, x double"
    )
    r = df.transform(mann_kendall("t", "x", partition_by="g")).collect()[0]
    s, z, sen = _mk_py(series)
    assert r["n_points"] == 40
    assert r["s_stat"] == s
    assert r["z"] == pytest.approx(z, abs=1e-5)
    assert r["sen_slope"] == pytest.approx(sen, abs=1e-5)
    assert r["z"] > 2.5 and 0.2 < r["sen_slope"] < 0.6  # planted trend


def test_mann_kendall_flat_and_tiny(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import mann_kendall

    # constant series → S = 0, var = 0 → z NULL
    flat = [("g", t, 3.0) for t in range(10)]
    df = spark.createDataFrame(flat, "g string, t int, x double")
    r = df.transform(mann_kendall("t", "x", partition_by="g")).collect()[0]
    assert r["s_stat"] == 0 and r["z"] is None

    tiny = [("g", 1, 1.0), ("g", 2, 2.0)]
    df2 = spark.createDataFrame(tiny, "g string, t int, x double")
    r2 = df2.transform(mann_kendall("t", "x", partition_by="g")).collect()[0]
    assert r2["z"] is None and r2["sen_slope"] is None


def _cp_py(series):
    pts = sorted(series)
    n = len(pts)
    xs = [x for _, x in pts]
    best = None
    for t in range(1, n):
        ml = sum(xs[:t]) / t
        mr = sum(xs[t:]) / (n - t)
        g = math.sqrt(t * (n - t) / n) * abs(ml - mr)
        if best is None or g > best[0] + 1e-12:
            best = (g, pts[t - 1][0], ml, mr)
    return best


def test_changepoint_recovers_planted_shift(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        binary_changepoint,
    )

    rng = random.Random(127)
    series = [
        (t, (5.0 if t > 25 else 0.0) + rng.gauss(0, 0.8))
        for t in range(1, 51)
    ]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in series], "g string, t int, x double"
    )
    r = df.transform(
        binary_changepoint("t", "x", partition_by="g")
    ).collect()[0]
    g, cp, ml, mr = _cp_py(series)
    assert r["cp_time"] == cp == 25
    assert r["g_stat"] == pytest.approx(g, abs=1e-4)
    assert r["mean_left"] == pytest.approx(ml, abs=1e-4)
    assert r["shift"] == pytest.approx(mr - ml, abs=1e-4)
    assert r["shift"] > 4.0


def test_changepoint_too_few_points_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        binary_changepoint,
    )

    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 9.0), ("g", 3, 9.5)],
        "g string, t int, x double",
    )
    r = df.transform(
        binary_changepoint("t", "x", partition_by="g")
    ).collect()[0]
    assert r["n_points"] == 3 and r["cp_time"] is None
