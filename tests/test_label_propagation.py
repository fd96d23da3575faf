"""Semantic tests for bounded-round label propagation: a pure-python
replay on a random graph, the two-clique-and-a-bridge fixture (the
communities LPA must find and CC must not), isolated-node stability,
and determinism across runs."""

from __future__ import annotations

import random
from collections import Counter, defaultdict


def _lpa_py(edges, rounds):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(lbl[m] for m in adj[n])
            best = min(((-c, l) for l, c in cnt.items()))
            new[n] = best[1]
        lbl = new
    return lbl


def test_lpa_matches_python_replay(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    rng = random.Random(53)
    edges = set()
    for _ in range(300):
        a, b = rng.randint(0, 60), rng.randint(0, 60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=3).collect()
    }
    want = _lpa_py(edges, 3)
    assert got == want


def test_lpa_two_cliques_with_bridge(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    # two 6-cliques joined by one bridge edge: CC sees ONE component,
    # LPA must keep TWO communities
    c1 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    c2 = [(a, b) for a in range(10, 16) for b in range(a + 1, 16)]
    edges = c1 + c2 + [(5, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    lpa = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=4).collect()
    }
    comms = set(lpa.values())
    left = {lpa[n] for n in range(6)}
    right = {lpa[n] for n in range(10, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert len(comms) == 2
    cc = connected_components(df, src="src", dst="dst")
    n_comp = cc.select("component").distinct().count()
    assert n_comp == 1  # CC merges what LPA separates


def test_lpa_deterministic_across_runs(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    rng = random.Random(59)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 40), rng.randint(0, 40)) for _ in range(150)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
    r2 = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
    assert r1 == r2
