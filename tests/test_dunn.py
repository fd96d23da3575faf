"""Semantic tests for Dunn's post-hoc with BH correction: python
reference (ranks, tie-corrected sigma, AS-erfc p, BH), planted-shift
rejections, and consistency with the Kruskal–Wallis omnibus."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest


def _erfc_as(x):
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * math.exp(-(x * x))


def _dunn_py(rows):
    """rows: (group, value). Returns {pair: (z, p, q)}"""
    vals = sorted(v for _, v in rows)
    # tie-averaged ranks
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        avg = (i + 1 + j) / 2.0
        rank_of[vals[i]] = avg
        i = j
    n = len(rows)
    ties = Counter(vals)
    tmass = sum(t**3 - t for t in ties.values())
    sig2 = n * (n + 1) / 12.0 - tmass / (12.0 * (n - 1))
    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(rank_of[v])
    groups = sorted(by_g)
    res = {}
    for a in range(len(groups)):
        for b in range(a + 1, len(groups)):
            gi, gj = groups[a], groups[b]
            ri = sum(by_g[gi]) / len(by_g[gi])
            rj = sum(by_g[gj]) / len(by_g[gj])
            z = (ri - rj) / math.sqrt(
                sig2 * (1 / len(by_g[gi]) + 1 / len(by_g[gj]))
            )
            p = round(_erfc_as(abs(z) / math.sqrt(2.0)), 6)
            res[(gi, gj)] = [z, p, None]
    # BH
    pairs = sorted(res, key=lambda k: (res[k][1], k))
    m = len(pairs)
    run = float("inf")
    for rank in range(m, 0, -1):
        k = pairs[rank - 1]
        run = min(run, res[k][1] * m / rank)
        res[k][2] = min(1.0, run)
    return res


def test_dunn_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import dunn_posthoc

    rng = random.Random(131)
    rows = []
    shifts = {"a": 0.0, "b": 0.08, "c": 2.5}
    for g, sh in shifts.items():
        for _ in range(150):
            rows.append((g, round(rng.gauss(sh, 1), 2)))
    df = spark.createDataFrame(
        [("pt", g, v) for g, v in rows], "part string, g string, v double"
    )
    out = {
        (r["group_i"], r["group_j"]): r
        for r in df.transform(
            dunn_posthoc("v", "g", partition_by="part")
        ).collect()
    }
    want = _dunn_py(rows)
    assert set(out) == set(want)
    for pair, (z, p, q) in want.items():
        r = out[pair]
        assert r["z"] == pytest.approx(z, abs=1e-4)
        assert r["p"] == pytest.approx(p, abs=2e-6)
        assert r["q_value"] == pytest.approx(q, abs=1e-4)
    # the planted far pair rejects, the near pair does not
    assert out[("a", "c")]["rejected"] is True
    assert out[("b", "c")]["rejected"] is True
    assert out[("a", "b")]["rejected"] is False
    assert all(r["m_tests"] == 3 for r in out.values())


def test_dunn_null_data_rejects_nothing(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import dunn_posthoc

    rng = random.Random(137)
    rows = [("pt", g, round(rng.gauss(0, 1), 2))
            for g in "abcd" for _ in range(100)]
    df = spark.createDataFrame(rows, "part string, g string, v double")
    out = df.transform(dunn_posthoc("v", "g", partition_by="part")).collect()
    assert len(out) == 6
    assert sum(1 for r in out if r["rejected"]) == 0
    for r in out:
        assert 0.0 <= r["p"] <= 1.0 and r["q_value"] >= r["p"] - 1e-9
