"""Semantic tests for the Markov stationary-distribution operator:
numpy power-iteration reference, the detailed-balance sanity on a
planted chain, zero-out-degree mass reinjection, and the catalog
fences."""

from __future__ import annotations

import random

import pytest


def _stationary_py(counts, k, iters):
    r = [sum(counts[i]) for i in range(k)]
    t = [
        [counts[i][j] / r[i] if r[i] > 0 else 0.0 for j in range(k)]
        for i in range(k)
    ]
    v = [1.0 / k] * k
    for _ in range(iters):
        u = [sum(v[i] * t[i][j] for i in range(k)) for j in range(k)]
        s = sum(u)
        v = [x / s for x in u] if s > 0 else [0.0] * k
    return v


def test_markov_matches_python_power_iteration(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )

    states = ["a", "b", "c"]
    rng = random.Random(47)
    # planted chain: a→b likely, b→c likely, c→a likely (a cycle with
    # noise) → roughly uniform stationary but nontrivial transitions
    rows = []
    cur = "a"
    for _ in range(3000):
        nxt = {"a": "b", "b": "c", "c": "a"}[cur]
        if rng.random() < 0.25:
            nxt = rng.choice(states)
        rows.append((cur, nxt))
        cur = nxt
    df = spark.createDataFrame(rows, "prv string, nxt string")
    got = {
        r["state"]: r
        for r in df.transform(
            markov_stationary("prv", "nxt", states, iterations=15)
        ).collect()
    }
    counts = [[0] * 3 for _ in range(3)]
    for p, n in rows:
        counts[states.index(p)][states.index(n)] += 1
    want = _stationary_py(counts, 3, 15)
    for i, s in enumerate(states):
        assert got[s]["stationary"] == pytest.approx(want[i], abs=1e-6)
        assert got[s]["n_out"] == sum(counts[i])
        assert got[s]["n_in"] == sum(row[i] for row in counts)
    assert sum(r["stationary"] for r in got.values()) == pytest.approx(
        1.0, abs=1e-5
    )


def test_markov_absorbing_state_dominates(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )

    # b is absorbing (b→b always); chain must pile mass onto b
    rows = [("a", "b")] * 10 + [("b", "b")] * 50 + [("a", "a")] * 5
    df = spark.createDataFrame(rows, "prv string, nxt string")
    got = {
        r["state"]: r["stationary"]
        for r in df.transform(
            markov_stationary("prv", "nxt", ["a", "b"], iterations=30)
        ).collect()
    }
    assert got["b"] > 0.95


def test_markov_zero_outdegree_mass_reinjected(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )

    # c never appears as prv → zero out-degree; renormalization keeps
    # the distribution summing to 1 instead of draining to 0
    rows = [("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")] * 10
    df = spark.createDataFrame(rows, "prv string, nxt string")
    out = df.transform(
        markov_stationary("prv", "nxt", ["a", "b", "c"], iterations=10)
    ).collect()
    total = sum(r["stationary"] for r in out)
    assert total == pytest.approx(1.0, abs=1e-5)
    byname = {r["state"]: r for r in out}
    assert byname["c"]["n_out"] == 0 and byname["c"]["n_in"] == 20


def test_markov_fences(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )

    with pytest.raises(ValueError):
        markov_stationary("p", "n", ["only"])
    with pytest.raises(ValueError):
        markov_stationary("p", "n", [f"s{i}" for i in range(33)])
    with pytest.raises(ValueError):
        markov_stationary("p", "n", ["a", "a"])
