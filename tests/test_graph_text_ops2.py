"""Semantic tests for the round-7 batch-2 operators: SAX words,
G² keyness, bounded k-core peel — Python reference implementations
and structural invariants that the oracle hash alone wouldn't explain
if they broke."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_sax_word_shape_and_symbols(spark):
    from btc_usdt_etl_pipeline_spark.operators.resample import (
        sax_symbolize,
    )

    # Low half then high half: word must be all-low letters then
    # all-high letters; length = n / chunk_size.
    rows = [(i, 1, i, -5.0 if i < 32 else 5.0) for i in range(64)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    out = df.transform(
        sax_symbolize(
            "value", chunk_size=8, alphabet=4,
            partition_by="user_id", order_by=("ts",),
        )
    ).collect()
    assert len(out) == 1
    assert out[0]["n_chunks"] == 8
    assert out[0]["sax"] == "aaaadddd"


def test_sax_constant_series_is_mid_letter(spark):
    from btc_usdt_etl_pipeline_spark.operators.resample import (
        sax_symbolize,
    )

    rows = [(i, 1, i, 42.0) for i in range(16)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    out = df.transform(
        sax_symbolize(
            "value", chunk_size=4, alphabet=4,
            partition_by="user_id", order_by=("ts",),
        )
    ).collect()
    # σ=0 → z≡0 → PAA 0 → 'a'+(0 > -.67) + (0 > 0) + (0 > .67) = 'b'
    assert out[0]["sax"] == "bbbb"


def test_keyness_g2_matches_python(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import keyness_g2

    docs = (
        [(i, "apple banana cherry", "A") for i in range(20)]
        + [(100 + i, "banana dates cherry", "B") for i in range(20)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = df.transform(
        keyness_g2("text", "source", min_count=1, top_k=5)
    ).collect()
    got = {(r["source"], r["token"]): r for r in out}
    # apple: 20 in A, 0 elsewhere. N_A = 60, N = 120, tt = 20.
    ea = 20 * 60 / 120
    want = round(2.0 * (20 * math.log(20 / ea)), 6)
    r = got[("A", "apple")]
    assert abs(r["g2"] - want) < 1e-9
    assert r["over_represented"] and r["n_in"] == 20 and r["n_out"] == 0
    # banana appears equally: G² == 0, never outranks apple.
    assert got[("A", "apple")]["rank"] == 1
    assert got[("B", "dates")]["rank"] == 1


def test_keyness_rank_deterministic_on_ties(spark):
    from btc_usdt_etl_pipeline_spark.operators.text import keyness_g2

    # Symmetric construction: x and y have identical counts → equal
    # G²; tie must break on token string order.
    docs = [(1, "x y", "A"), (2, "x y", "A"), (3, "z z", "B")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = df.transform(
        keyness_g2("text", "source", min_count=1, top_k=10)
    ).where(F.col("source") == "A").orderBy("rank").collect()
    toks = [r["token"] for r in out]
    assert toks == sorted(toks[:2]) + toks[2:]


def test_kcore_peel_matches_python(spark):
    import random

    from btc_usdt_etl_pipeline_spark.operators.graph import kcore_peel

    rng = random.Random(13)
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in kcore_peel(df, k=4, iterations=10).collect()
    }
    # Python reference: peel to fixpoint.
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if sum(1 for m in adj[n] if m in alive) < 4}
        if not drop:
            break
        alive -= drop
    want = {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }
    assert got == want


def test_kcore_triangle_survives_k2(spark):
    from btc_usdt_etl_pipeline_spark.operators.graph import kcore_peel

    # Triangle + pendant chain: 2-core = the triangle only.
    e = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    sym = e + [(b, a) for a, b in e]
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in kcore_peel(df, k=2, iterations=5).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
