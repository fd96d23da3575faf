"""Training-export operators: mixture planning, shuffle-sharding,
concat-and-chunk packing (operators/export.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.export import (
    mix_plan,
    pack_sequences,
    shard_export,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (i, " ".join(["tok"] * (5 + i % 7)), f"src{i % 3}")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _tokens():
    return F.size(F.split(F.col("text"), " ")).cast("long")


def test_mix_plan_budget_and_rates(spark, docs):
    out = docs.transform(
        mix_plan(
            "source", _tokens(), budget_tokens=900, weights={"src0": 2.0}
        )
    ).collect()
    by_src = {r["source"]: r for r in out}
    assert set(by_src) == {"src0", "src1", "src2"}
    # weights 2,1,1 over budget 900 -> targets 450,225,225
    assert by_src["src0"]["target_tokens"] == 450
    assert by_src["src1"]["target_tokens"] == 225
    for r in out:
        if r["target_tokens"] >= r["available_tokens"]:
            assert r["rate_bp"] == 10_000
            assert r["epochs"] >= 1
        else:
            assert (
                r["rate_bp"]
                == 10_000 * r["target_tokens"] // r["available_tokens"]
            )
            assert r["epochs"] == 1


def test_shard_positions_dense_and_deterministic(spark, docs):
    out = docs.transform(shard_export("doc_id", n_shards=8)).collect()
    assert len(out) == 120
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    # positions within each shard are a dense 0-based range
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # deterministic under different partitioning
    again = (
        docs.repartition(7)
        .transform(shard_export("doc_id", n_shards=8))
        .collect()
    )
    assert {(r["doc_id"], r["shard_id"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard_id"], r["pos"]) for r in out
    }


def test_pack_tape_is_contiguous(spark, docs):
    out = (
        docs.transform(
            pack_sequences("doc_id", _tokens(), chunk_tokens=64)
        )
        .select("doc_id", "tokens", "start_offset", "start_chunk", "end_chunk")
        .collect()
    )
    # the tape has no holes and no overlaps: sorting by start_offset,
    # each doc starts exactly where the previous ended
    rows = sorted(out, key=lambda r: r["start_offset"])
    expect = 0
    for r in rows:
        assert r["start_offset"] == expect
        expect += r["tokens"]
        assert r["start_chunk"] == r["start_offset"] // 64
        last_token = r["start_offset"] + max(r["tokens"] - 1, 0)
        assert r["end_chunk"] == max(last_token // 64, r["start_chunk"])
    # total tape length = total token count
    assert expect == sum(r["tokens"] for r in out)


def test_pack_deterministic_under_repartition(spark, docs):
    a = docs.transform(pack_sequences("doc_id", _tokens())).collect()
    b = (
        docs.repartition(11)
        .transform(pack_sequences("doc_id", _tokens()))
        .collect()
    )
    key = lambda rs: {(r["doc_id"], r["start_offset"]) for r in rs}  # noqa: E731
    assert key(a) == key(b)


def test_mix_plan_zero_token_source(spark):
    """A source whose docs all tokenize to zero tokens must yield a
    (rate_bp=0, epochs=1) row, not an ANSI DIVIDE_BY_ZERO abort."""
    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.operators.export import mix_plan

    df = spark.createDataFrame(
        [("web", 100), ("empty", 0), ("empty", 0)],
        "source string, n_tok long",
    )
    rows = df.transform(
        mix_plan("source", F.col("n_tok"), budget_tokens=50)
    ).collect()
    got = {r.source: r for r in rows}
    assert got["empty"].available_tokens == 0
    assert got["empty"].rate_bp == 0 and got["empty"].epochs == 1
    assert got["web"].rate_bp > 0


def test_pack_zero_token_docs_edge_free(spark):
    """Zero-token docs (r5 verdict, q129): end_chunk must pin to
    start_chunk via the explicit CASE — in particular a zero-token doc
    landing at tape offset 0 must NOT evaluate integer division on a
    negative operand (engines disagree on -1 // N: floor vs truncate).
    Every doc_id here hashes somewhere on the tape; several have zero
    tokens, and with enough of them one occupies each boundary shape."""
    rows = [(i, 0 if i % 3 == 0 else (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = (
        df.transform(
            pack_sequences("doc_id", F.col("n_tok"), chunk_tokens=7)
        )
        .select("doc_id", "tokens", "start_offset", "start_chunk", "end_chunk")
        .collect()
    )
    assert len(out) == 200
    zeros = [r for r in out if r["tokens"] == 0]
    assert len(zeros) == 67
    tape = sorted(out, key=lambda r: (r["start_offset"], r["doc_id"]))
    # the first tape position is offset 0; zero-token docs sort in at
    # their winner's offset too, so at least one zero-token doc shares
    # an offset boundary with a chunk cut somewhere on a 200-doc tape
    assert tape[0]["start_offset"] == 0
    for r in out:
        assert r["start_chunk"] == r["start_offset"] // 7
        if r["tokens"] == 0:
            assert r["end_chunk"] == r["start_chunk"]
        else:
            assert r["end_chunk"] == (r["start_offset"] + r["tokens"] - 1) // 7
            assert r["end_chunk"] >= r["start_chunk"]


def test_pack_zero_token_doc_at_offset_zero(spark):
    """Pin the exact divergence cell: a single zero-token doc alone on
    the tape sits at start_offset 0 and must emit (0, 0) chunks."""
    df = spark.createDataFrame([(1, 0)], "doc_id long, n_tok long")
    row = (
        df.transform(pack_sequences("doc_id", F.col("n_tok")))
        .select("start_offset", "start_chunk", "end_chunk")
        .collect()[0]
    )
    assert (row["start_offset"], row["start_chunk"], row["end_chunk"]) == (
        0, 0, 0,
    )


def test_auto_bucket_policy_pure():
    """The auto sizing policy (r5 verdict #5): bucket count grows
    linearly with input size at ~target bytes per bucket, clamped to
    [lo, hi], and degrades to lo on a missing/zero estimate."""
    from btc_usdt_etl_pipeline_spark.operators.export import _auto_buckets

    mb = 1 << 20
    assert _auto_buckets(0, 256 * mb, lo=16) == 16
    assert _auto_buckets(-1, 256 * mb, lo=16) == 16  # unknown stats
    assert _auto_buckets(100 * mb, 256 * mb, lo=16) == 16  # below lo
    assert _auto_buckets(10_000 * mb, 256 * mb, lo=16) == 40
    # 100 TB at 256 MB/shard -> ~400k shards, within the hi clamp
    assert _auto_buckets(100 * (1 << 40), 256 * mb, lo=16) == 409_600
    assert _auto_buckets(1 << 60, 256 * mb, lo=16) == 1 << 20  # hi clamp


def test_export_auto_sizing_end_to_end(spark, docs):
    """'auto' resolves from the plan-size estimate with no extra jobs
    and yields a valid layout: dense per-shard positions, contiguous
    tape.  At fixture scale auto == the lo clamp."""
    sharded = docs.transform(shard_export("doc_id", n_shards="auto"))
    assert sharded.select("shard_id").distinct().count() <= 16
    # positions dense per shard
    agg = (
        sharded.groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"))
        .collect()
    )
    for r in agg:
        assert r["mx"] == r["n"] - 1

    packed = docs.transform(
        pack_sequences("doc_id", _tokens(), num_buckets="auto")
    ).collect()
    rows = sorted(packed, key=lambda r: r["start_offset"])
    expect = 0
    for r in rows:
        assert r["start_offset"] == expect
        expect += r["tokens"]


def test_export_bucket_row_bound(spark):
    """The scale contract: with B buckets over N hash-uniform ids, no
    single bucket (= one window partition) holds more than ~4x the mean
    N/B — the guarantee that sizing B via 'auto' keeps every window
    task bounded.  Checked empirically on 4,000 ids at B=32."""
    n, b = 4_000, 32
    df = spark.createDataFrame(
        [(i, 1) for i in range(n)], "doc_id long, n_tok long"
    )
    out = df.transform(
        pack_sequences("doc_id", F.col("n_tok"), num_buckets=b)
    )
    # reconstruct the bucket from the same portable hash
    from btc_usdt_etl_pipeline_spark.operators.dedup import portable_hash60

    bucket = (
        portable_hash60(
            F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))
        )
        % b
    )
    sizes = [
        r["c"]
        for r in out.groupBy(bucket.alias("bk"))
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(sizes) == b
    assert max(sizes) <= 4 * (n // b)


def test_length_bucketed_shards_layout(spark):
    """Buckets are equal-frequency in length; within a (bucket, shard)
    the positions are dense 0..n-1; every shard's length range is
    bounded by its bucket's range (the pad-waste guarantee); layout is
    partitioning-independent."""
    from btc_usdt_etl_pipeline_spark.operators.export import (
        length_bucketed_shards,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, (i * 37) % 400 + 1) for i in range(800)],
        "doc_id long, n_tokens long",
    )
    t = length_bucketed_shards(
        "doc_id", "n_tokens", n_buckets=4, shards_per_bucket=3
    )
    rows = df.transform(t).collect()
    assert len(rows) == 800
    from collections import defaultdict

    by_bucket = defaultdict(list)
    by_bs = defaultdict(list)
    for r in rows:
        by_bucket[r.len_bucket].append(r.n_tokens)
        by_bs[(r.len_bucket, r.shard_id)].append(r.pos)
    # equal-frequency quartiles
    assert set(by_bucket) == {0, 1, 2, 3}
    assert all(150 <= len(v) <= 250 for v in by_bucket.values())
    # bucket ranges are disjoint (monotone binning)
    ranges = [
        (min(v), max(v)) for _, v in sorted(by_bucket.items())
    ]
    assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))
    # dense positions per (bucket, shard)
    for poss in by_bs.values():
        assert sorted(poss) == list(range(len(poss)))
    # partitioning-independence
    rows2 = df.repartition(13).transform(t).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_temperature_rates_alpha_half_reference(spark):
    import math

    from btc_usdt_etl_pipeline_spark.operators.export import (
        temperature_rates,
    )

    rows = [("en", 90000), ("fr", 10000), ("de", 2500), ("zz", 0)]
    df = spark.createDataFrame(rows, "lang string, n long")
    got = {
        r["lang"]: r["rate_bp"]
        for r in df.transform(
            temperature_rates("lang", F.col("n"))
        ).collect()
    }
    # reference: rate ∝ n^(α-1) = 1/sqrt(n), normalized to max
    rr = {g: (math.sqrt(n) / n if n > 0 else 0.0) for g, n in rows}
    rmax = max(rr.values())
    want = {g: int(10_000 * v / rmax) for g, v in rr.items()}
    assert got == want
    # smallest non-empty group samples at 100%, zero group at 0%
    assert got["de"] == 10_000
    assert got["zz"] == 0


def test_temperature_rates_flatten_monotone(spark):
    """Lower alpha flattens harder: the big group's rate drops."""
    from btc_usdt_etl_pipeline_spark.operators.export import (
        temperature_rates,
    )

    rows = [("big", 1_000_000), ("small", 1_000)]
    df = spark.createDataFrame(rows, "g string, n long")

    def rate(alpha):
        return {
            r["g"]: r["rate_bp"]
            for r in df.transform(
                temperature_rates("g", F.col("n"), alpha=alpha)
            ).collect()
        }

    r_natural = rate(1.0)
    r_half = rate(0.5)
    assert r_natural["big"] == 10_000  # α=1: no reweighting
    assert r_half["big"] < r_natural["big"]
    assert r_half["small"] == 10_000


def test_temperature_sample_deterministic_subset(spark, docs):
    from btc_usdt_etl_pipeline_spark.operators.export import (
        temperature_sample,
    )

    tcount = F.size(F.split("text", r"\s+"))
    t = temperature_sample("source", "doc_id", tcount)
    a = sorted(r["doc_id"] for r in docs.transform(t).collect())
    b = sorted(r["doc_id"] for r in docs.transform(t).collect())
    assert a == b  # reruns identical
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert set(a) <= all_ids  # downsample-only
