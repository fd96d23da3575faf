"""Semantic tests for the second round-10 stats batch: mutual
information, Benjamini–Hochberg FDR, Mantel–Haenszel, Nelson–Aalen —
Python references plus the textbook invariants (MI = 0 under
independence, BH monotonicity, MH vs crude OR under confounding,
Nelson–Aalen vs Kaplan–Meier consistency)."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------- MI
def _mi_py(pairs):
    n = len(pairs)
    jo = Counter(pairs)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    mi = sum(
        (c / n) * math.log((c / n) / ((ma[a] / n) * (mb[b] / n)))
        for (a, b), c in jo.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ma.values())
    hb = -sum((c / n) * math.log(c / n) for c in mb.values())
    return mi, ha, hb


def test_mutual_information_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        mutual_information,
    )

    rng = random.Random(13)
    pairs = []
    for _ in range(500):
        a = rng.choice("xyz")
        b = a.upper() if rng.random() < 0.6 else rng.choice("XYZW")
        pairs.append((a, b))
    df = spark.createDataFrame(
        [("g", a, b) for a, b in pairs], "g string, a string, b string"
    )
    r = df.transform(
        mutual_information("a", "b", partition_by="g")
    ).collect()[0]
    mi, ha, hb = _mi_py(pairs)
    assert r["n"] == 500
    assert r["mi"] == pytest.approx(mi, abs=1e-4)
    assert r["h_a"] == pytest.approx(ha, abs=1e-4)
    assert r["h_b"] == pytest.approx(hb, abs=1e-4)
    assert r["nmi"] == pytest.approx(mi / math.sqrt(ha * hb), abs=1e-4)


def test_mutual_information_independent_and_identical(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        mutual_information,
    )

    # perfectly independent uniform grid → MI = 0
    grid = [("g", a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(grid, "g string, a string, b string")
    r = df.transform(
        mutual_information("a", "b", partition_by="g")
    ).collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-9)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-9)

    # b == a → MI = H(A), NMI = 1
    same = [("g", c, c) for c in "xxyyz"]
    df2 = spark.createDataFrame(same, "g string, a string, b string")
    r2 = df2.transform(
        mutual_information("a", "b", partition_by="g")
    ).collect()[0]
    assert r2["mi"] == pytest.approx(r2["h_a"], abs=1e-6)
    assert r2["nmi"] == pytest.approx(1.0, abs=1e-6)

    # constant column → zero entropy → NMI NULL
    const = [("g", "x", b) for b in "pqpq"]
    df3 = spark.createDataFrame(const, "g string, a string, b string")
    r3 = df3.transform(
        mutual_information("a", "b", partition_by="g")
    ).collect()[0]
    assert r3["h_a"] == pytest.approx(0.0, abs=1e-9)
    assert r3["nmi"] is None


# ------------------------------------------------------------------- BH
def _bh_py(ps):
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    q = [0.0] * m
    run = float("inf")
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        run = min(run, ps[i] * m / rank)
        q[i] = min(1.0, run)
    return q


def test_fdr_bh_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import fdr_bh

    rng = random.Random(17)
    ps = [round(rng.random(), 4) for _ in range(50)] + [0.0001, 0.0002]
    rows = [("fam", i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "fam string, tid int, p double")
    got = {
        r["tid"]: r
        for r in df.transform(
            fdr_bh("p", tiebreak="tid", group_by="fam", alpha=0.05)
        ).collect()
    }
    want = _bh_py(ps)
    for i, p in enumerate(ps):
        assert got[i]["q_value"] == pytest.approx(want[i], abs=1e-6)
        assert got[i]["m_tests"] == len(ps)
        assert got[i]["rejected"] == (round(want[i], 6) <= 0.05)
    # q is monotone non-decreasing in p-rank and >= its p
    by_rank = sorted(got.values(), key=lambda r: r["bh_rank"])
    for prev, cur in zip(by_rank, by_rank[1:]):
        assert prev["q_value"] <= cur["q_value"] + 1e-12
    for r in by_rank:
        assert r["q_value"] >= r["p"] - 1e-9


def test_fdr_bh_tied_pvalues_get_equal_q(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import fdr_bh

    rows = [("f", 1, 0.01), ("f", 2, 0.01), ("f", 3, 0.5)]
    df = spark.createDataFrame(rows, "fam string, tid int, p double")
    out = df.transform(
        fdr_bh("p", tiebreak="tid", group_by="fam")
    ).collect()
    qs = {r["tid"]: r["q_value"] for r in out}
    assert qs[1] == qs[2] == pytest.approx(0.015, abs=1e-9)
    assert qs[3] == pytest.approx(0.5, abs=1e-9)


# ------------------------------------------------------------------- MH
def test_mantel_haenszel_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        mantel_haenszel,
    )

    rng = random.Random(19)
    rows = []
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for _ in range(3000):
        s = rng.choice("ABC")
        base = {"A": 0.2, "B": 0.4, "C": 0.6}[s]
        ex = rng.random() < {"A": 0.3, "B": 0.5, "C": 0.7}[s]
        oc = rng.random() < (base * (1.8 if ex else 1.0))
        rows.append(("g", s, ex, oc))
        idx = (0 if oc else 1) if ex else (2 if oc else 3)
        cells[s][idx] += 1
    df = spark.createDataFrame(
        rows, "g string, s string, ex boolean, oc boolean"
    )
    r = df.transform(
        mantel_haenszel("s", F.col("ex"), F.col("oc"), partition_by="g")
    ).collect()[0]
    sad = sum(a * d / (a + b + c + d) for a, b, c, d in cells.values())
    sbc = sum(b * c / (a + b + c + d) for a, b, c, d in cells.values())
    sdev = sum(
        a - (a + b) * (a + c) / (a + b + c + d)
        for a, b, c, d in cells.values()
    )
    sv = sum(
        (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for a, b, c, d in cells.values()
    )
    assert r["n_strata"] == 3 and r["n"] == 3000
    assert r["or_mh"] == pytest.approx(sad / sbc, abs=1e-4)
    assert r["cmh_chi2"] == pytest.approx(sdev**2 / sv, abs=1e-3)
    # planted effect: stratified OR must sit near the true 1.8-ish
    # multiplier's odds ratio, clearly above 1
    assert r["or_mh"] > 1.3


def test_mantel_haenszel_degenerate_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        mantel_haenszel,
    )

    # no unexposed-outcome mass in any stratum → Σbc = 0 → OR NULL
    rows = [("g", "s", True, True), ("g", "s", False, False)]
    df = spark.createDataFrame(
        rows, "g string, s string, ex boolean, oc boolean"
    )
    r = df.transform(
        mantel_haenszel("s", F.col("ex"), F.col("oc"), partition_by="g")
    ).collect()[0]
    assert r["or_mh"] is None


# ----------------------------------------------------------- Nelson–Aalen
def test_nelson_aalen_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import nelson_aalen

    rng = random.Random(23)
    subj = [
        ("g", rng.randint(1, 15), rng.random() < 0.7) for _ in range(300)
    ]
    df = spark.createDataFrame(subj, "g string, dur int, ev boolean")
    out = df.transform(
        nelson_aalen("dur", event_col=F.col("ev"), group_by="g")
    ).collect()
    # python reference
    per_t = defaultdict(lambda: [0, 0])
    for _, t, ev in subj:
        per_t[t][0 if ev else 1] += 1
    times = sorted(per_t)
    at_risk = len(subj)
    h = v = 0.0
    want = {}
    for t in times:
        d, c = per_t[t]
        h += round(d / at_risk, 6)
        v += round(d / at_risk**2, 6)
        if d > 0:
            want[t] = (at_risk, d, c, h, v)
        at_risk -= d + c
    got = {r["t"]: r for r in out}
    assert set(got) == set(want)
    for t, (n_risk, d, c, ch, vh) in want.items():
        r = got[t]
        assert r["n_risk"] == n_risk
        assert r["n_events"] == d and r["n_censored"] == c
        assert r["cum_hazard"] == pytest.approx(ch, abs=1e-9)
        assert r["var_hazard"] == pytest.approx(vh, abs=1e-9)
        assert r["fh_survival"] == pytest.approx(
            math.exp(-ch), abs=1e-5
        )


def test_nelson_aalen_consistent_with_kaplan_meier(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        kaplan_meier,
        nelson_aalen,
    )

    rng = random.Random(29)
    subj = [
        ("g", rng.randint(1, 30), rng.random() < 0.6) for _ in range(800)
    ]
    df = spark.createDataFrame(subj, "g string, dur int, ev boolean")
    na = {
        r["t"]: r
        for r in df.transform(
            nelson_aalen("dur", event_col=F.col("ev"), group_by="g")
        ).collect()
    }
    km = {
        r["t"]: r
        for r in df.transform(
            kaplan_meier("dur", event_col=F.col("ev"), group_by="g")
        ).collect()
    }
    assert set(na) == set(km)
    for t in na:
        # same risk-set algebra
        assert na[t]["n_risk"] == km[t]["n_risk"]
        # FH survival upper-bounds KM and tracks it closely while
        # risk sets are large (exp(-x) >= 1-x termwise)
        assert na[t]["fh_survival"] >= km[t]["survival"] - 1e-6
        # the exp(-h) vs (1-h) gap accumulates with hazard mass, so
        # only pin closeness while survival is still high
        if km[t]["survival"] > 0.5:
            assert na[t]["fh_survival"] == pytest.approx(
                km[t]["survival"], rel=0.05
            )
