"""Semantic tests for multi-source BFS distances: python reference on
a random graph, a chain (round-bound truncation), and degenerate
fences (empty sources, disconnected nodes)."""

from __future__ import annotations

import random
from collections import defaultdict, deque


def _bfs_py(edges, seeds, max_rounds):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_rounds:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import bfs_distances

    rng = random.Random(277)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 120), rng.randint(0, 120))
                for _ in range(180)
            )
            if a != b
        }
    )
    seeds = [0, 7, 50]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, sdf, max_rounds=4).collect()
    }
    assert out == _bfs_py(edges, seeds, 4)


def test_bfs_chain_truncates_at_max_rounds(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import bfs_distances

    # chain 0-1-2-...-10, seed 0, 3 rounds -> nodes 0..3 only
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(0,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, sdf, max_rounds=3).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_empty_sources_and_disconnected(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import bfs_distances

    edges = [(1, 2), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    empty = spark.createDataFrame([], "node long")
    assert bfs_distances(df, empty, max_rounds=2).count() == 0
    sdf = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, sdf, max_rounds=5).collect()
    }
    assert out == {1: 0, 2: 1}  # 3-4 component unreachable
