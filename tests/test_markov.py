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


def test_markov_stationary_driver_matches_sql_schedule(spark):
    """r14: the driver-Python power-iteration replay (pair-count
    collect + exact left-fold arithmetic) must be BIT-identical to the
    r13 SQL schedule — compared exactly, not approximately — on a
    random fixture including out-of-catalog and NULL rows, and on
    empty input (stationary 0.0, NULL n_out/n_in)."""
    import random as _r

    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_schedule,
        markov_stationary,
    )

    def sql_arm(df, states, iterations):
        k = len(states)
        p, n = F.col("prv"), F.col("nxt")
        aggs = []
        for i in range(k):
            for j in range(k):
                aggs.append(
                    F.sum(
                        F.when((p == states[i]) & (n == states[j]), 1)
                        .otherwise(0)
                    )
                    .cast("double")
                    .alias(f"c_{i}_{j}")
                )
        row = df.agg(*aggs)
        base, rounds = markov_schedule(states, iterations)
        row = row.select("*", *[F.expr(e).alias(c) for c, e in base])
        for step in rounds:
            row = row.select("*", *[F.expr(e).alias(c) for c, e in step])
        cells = []
        for i, name in enumerate(states):
            col_in = " + ".join(f"c_{j}_{i}" for j in range(k))
            cells.extend(
                [
                    f"'{name}'",
                    f"CAST(mk_r_{i} AS BIGINT)",
                    f"CAST(({col_in}) AS BIGINT)",
                    f"round(v{iterations}_{i}, 6)",
                ]
            )
        return row.select(
            F.expr(
                f"stack({k}, {', '.join(cells)}) AS "
                "(state, n_out, n_in, stationary)"
            )
        )

    states = ["s0", "s1", "s2", "s3", "s4"]
    rng = _r.Random(23)
    rows = [
        (rng.choice(states), rng.choice(states)) for _ in range(2500)
    ]
    rows += [("zzz", "s0"), ("s1", "zzz"), (None, "s2"), ("s3", None)]
    df = spark.createDataFrame(rows, "prv string, nxt string")
    for iters in (1, 15):
        got = sorted(
            df.transform(
                markov_stationary("prv", "nxt", states, iterations=iters)
            ).collect()
        )
        want = sorted(sql_arm(df, states, iters).collect())
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    empty = spark.createDataFrame([], "prv string, nxt string")
    got_e = sorted(
        empty.transform(markov_stationary("prv", "nxt", states)).collect()
    )
    want_e = sorted(sql_arm(empty, states, 15).collect())
    assert [tuple(r) for r in got_e] == [tuple(r) for r in want_e]
    assert all(
        r["stationary"] == 0.0 and r["n_out"] is None for r in got_e
    )


def test_markov_stationary_rejects_streaming_input(spark):
    """r15 contract pin: the power-iteration replay collects the
    transition-count row eagerly at apply time, so a streaming input
    must raise a clear ValueError instead of an opaque
    AnalysisException from .first()."""
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )

    sdf = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS p", "CAST(value + 1 AS STRING) AS n"
    )
    with pytest.raises(ValueError, match="batch-only"):
        markov_stationary("p", "n", ["a", "b"])(sdf)
