"""Semantic tests for neighbor-overlap link prediction: python
reference on a random graph, a hand-checked fixture, and the
existing-edge exclusion property."""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest


def _lp_py(edges, top_k):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    eset = {(min(a, b), max(a, b)) for a, b in edges}
    scores = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in eset:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            cn = len(common)
            aa = sum(
                round(1.0 / math.log(len(adj[w])), 6) for w in common
            )
            jac = cn / (len(adj[u]) + len(adj[v]) - cn)
            scores[(u, v)] = (cn, jac, aa)
    ranked = sorted(
        scores.items(), key=lambda kv: (-kv[1][2], kv[0])
    )[:top_k]
    return dict(ranked)


def test_link_prediction_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import (
        link_prediction,
    )

    rng = random.Random(151)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 50), rng.randint(0, 50))
                for _ in range(220)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        (r["u"], r["v"]): r for r in link_prediction(df, top_k=15).collect()
    }
    want = _lp_py(edges, 15)
    assert set(out) == set(want)
    eset = set(edges)
    for pair, (cn, jac, aa) in want.items():
        assert pair not in eset  # never scores an existing edge
        r = out[pair]
        assert r["cn"] == cn
        assert r["jaccard"] == pytest.approx(jac, abs=1e-6)
        assert r["adamic_adar"] == pytest.approx(aa, abs=1e-5)


def test_link_prediction_hand_checked(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import (
        link_prediction,
    )

    # path 1-2-3 plus 2-4: candidates (1,3),(1,4),(3,4) all share hub 2
    edges = [(1, 2), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        (r["u"], r["v"]): r for r in link_prediction(df, top_k=10).collect()
    }
    assert set(out) == {(1, 3), (1, 4), (3, 4)}
    aa = round(1 / math.log(3), 6)  # hub degree 3
    for r in out.values():
        assert r["cn"] == 1
        assert r["adamic_adar"] == pytest.approx(aa, abs=1e-6)
        assert r["jaccard"] == pytest.approx(1.0, abs=1e-6)  # 1/(1+1-1)
