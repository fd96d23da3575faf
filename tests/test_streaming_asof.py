"""Streaming as-of enrichment (streaming/asof.py): union of per-batch
enrichments over a time-ordered split == the whole-history batch
asof_join; retry idempotence; dimension-store compaction; tie_cols
determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

ROWS = [
    # (event_id, user, ts, kind, value)
    (1, "a", 10, "dim", 1.0),
    (2, "a", 15, "fact", 100.0),
    (3, "b", 16, "fact", 200.0),   # no dim yet -> NULL
    (4, "a", 20, "dim", 2.0),
    (5, "a", 20, "fact", 300.0),   # same-ts dim matches (>=)
    # --- batch 1 (ts >= 30) ---
    (6, "b", 30, "dim", 3.0),
    (7, "a", 35, "fact", 400.0),   # matches dim@20 from batch 0
    (8, "b", 36, "fact", 500.0),   # matches dim@30 same batch
    # --- batch 2 (ts >= 50) ---
    (9, "a", 50, "dim", 4.0),
    (10, "a", 55, "fact", 600.0),  # matches dim@50
    (11, "b", 56, "fact", 700.0),  # still dim@30 (two batches back)
]
SCHEMA = "event_id long, user string, ts long, kind string, value double"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _mk_upsert(spark, state, **kw):
    from btc_usdt_etl_pipeline_spark.streaming.asof import (
        incremental_asof_upsert,
    )

    params = dict(
        time_col="ts",
        by=["user"],
        left_pred="kind = 'fact'",
        right_pred="kind = 'dim'",
        right_value_cols={"dim_value": "value"},
        left_cols=["event_id", "user", "ts", "value"],
    )
    params.update(kw)
    return incremental_asof_upsert(spark, state, **params)


def _batch_answer(spark, df, **kw):
    from btc_usdt_etl_pipeline_spark.operators.asof import asof_join

    facts = df.filter("kind = 'fact'").select(
        "event_id", "user", "ts", "value"
    )
    dim = df.filter("kind = 'dim'").select(
        "user", "ts", F.col("value").alias("dim_value")
    )
    return sorted(
        map(
            tuple,
            asof_join(
                facts, dim, time_col="ts", by=["user"],
                right_value_cols=["dim_value"], **kw,
            ).collect(),
        )
    )


def _result(spark, state):
    from btc_usdt_etl_pipeline_spark.streaming.asof import (
        read_asof_result,
    )

    return sorted(map(tuple, read_asof_result(spark, state).collect()))


def test_streaming_asof_equals_batch_and_retry(spark, tmp_path):
    df = _df(spark)
    want = _batch_answer(spark, df)
    state = str(tmp_path / "state")
    up = _mk_upsert(spark, state)
    batches = [
        df.filter("ts < 30"),
        df.filter("ts >= 30 and ts < 50"),
        df.filter("ts >= 50"),
    ]
    up(batches[0], 0)
    up(batches[1], 1)
    up(batches[2], 2)
    assert _result(spark, state) == want
    # NULL for the fact that preceded any dimension row
    nulls = [r for r in _result(spark, state) if r[0] == 3]
    assert nulls and nulls[0][-1] is None
    # replayed last batch (retry contract) -> identical state
    up(batches[2], 2)
    assert _result(spark, state) == want


def test_streaming_asof_compaction_and_guard(spark, tmp_path):
    from btc_usdt_etl_pipeline_spark.streaming.neardup import (
        _contrib_state,
        compact_contributions,
    )

    df = _df(spark)
    want = _batch_answer(spark, df)
    state = str(tmp_path / "state")
    up = _mk_upsert(spark, state)
    up(df.filter("ts < 30"), 0)
    up(df.filter("ts >= 30 and ts < 50"), 1)
    compact_contributions(spark, f"{state}/dim")
    compact_contributions(spark, f"{state}/out")
    k, live = _contrib_state(spark, f"{state}/dim")
    assert k == 1 and live == []
    up(df.filter("ts >= 50"), 2)  # builds on the compacted dimension
    assert _result(spark, state) == want
    with pytest.raises(ValueError, match="compaction"):
        up(df.filter("ts >= 50"), 1)


def test_streaming_asof_tolerance(spark, tmp_path):
    df = _df(spark)
    want = _batch_answer(spark, df, tolerance=10)
    state = str(tmp_path / "state")
    up = _mk_upsert(spark, state, tolerance=10)
    up(df.filter("ts < 30"), 0)
    up(df.filter("ts >= 30"), 1)
    got = _result(spark, state)
    assert got == want
    # user b's fact@56 is 26 past dim@30 -> tolerance nulls it
    assert [r[-1] for r in got if r[0] == 11] == [None]


def test_streaming_asof_tie_cols(spark, tmp_path):
    """Two dimension rows at the SAME (key, ts): tie_cols picks the
    higher event_id deterministically for future batches."""
    rows = [
        (1, "a", 10, "dim", 1.0),
        (2, "a", 10, "dim", 2.0),   # tie on ts, larger event_id
        (3, "a", 30, "fact", 9.0),  # next batch -> must see 2.0
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    state = str(tmp_path / "state")
    up = _mk_upsert(spark, state, tie_cols=["event_id"])
    up(df.filter("ts < 20"), 0)
    up(df.filter("ts >= 20"), 1)
    got = _result(spark, state)
    assert [r[-1] for r in got if r[0] == 3] == [2.0]
