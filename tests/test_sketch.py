"""Count-min sketch tests against a Python-computed reference grid."""

from __future__ import annotations

import hashlib
from collections import Counter


def _bucket(key: str, row: int, width: int) -> int:
    h = int(hashlib.md5(f"cms{row}:{key}".encode()).hexdigest()[:15], 16)
    return h % width


def _py_cms(counts: Counter, depth: int, width: int):
    grid = [[0] * width for _ in range(depth)]
    for k, c in counts.items():
        for r in range(depth):
            grid[r][_bucket(k, r, width)] += c
    return {
        k: min(grid[r][_bucket(k, r, width)] for r in range(depth))
        for k in counts
    }


def test_cms_heavy_hitters_matches_python_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.sketch import (
        cms_heavy_hitters,
    )

    occurrences = (
        ["hot"] * 50 + ["warm"] * 20 + ["mild"] * 5
        + [f"rare{i}" for i in range(40)]
    )
    counts = Counter(occurrences)
    depth, width = 3, 8  # width << vocab → collisions guaranteed
    expected_est = _py_cms(counts, depth, width)

    df = spark.createDataFrame([(t,) for t in occurrences], "tok string")
    rows = df.transform(
        cms_heavy_hitters("tok", depth=depth, width=width, k=1000)
    ).collect()
    got = {r.tok: r for r in rows}

    assert set(got) == set(counts)
    for tok, r in got.items():
        assert r.exact == counts[tok]
        assert r.est == expected_est[tok]
        assert r.est >= r.exact  # CMS never underestimates
    # With 43 keys in 8 buckets the sketch MUST overestimate somewhere,
    # otherwise the collision path was never exercised.
    assert any(r.est > r.exact for r in rows)
    # Deterministic ranking: est desc, key asc.
    ranked = sorted(rows, key=lambda r: (-r.est, r.tok))
    assert [r.rnk for r in ranked] == list(range(1, len(rows) + 1))


def test_cms_property_vs_python(spark):
    """Property test: for arbitrary multisets and sketch geometries the
    engine grid matches the Python reference exactly, est ≥ exact
    always, and totals are conserved per sketch row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from btc_usdt_etl_pipeline_spark.operators.sketch import (
        cms_heavy_hitters,
        count_min_sketch,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        occurrences=st.lists(
            st.sampled_from(["a", "bb", "ccc", "d", "e", "ff", "g"]),
            min_size=1,
            max_size=60,
        ),
        depth=st.sampled_from([1, 2, 3]),
        width=st.sampled_from([2, 4, 16]),
    )
    def run(occurrences, depth, width):
        counts = Counter(occurrences)
        expected = _py_cms(counts, depth, width)
        df = spark.createDataFrame(
            [(t,) for t in occurrences], "tok string"
        )
        rows = df.transform(
            cms_heavy_hitters("tok", depth, width, k=100)
        ).collect()
        assert {r.tok: r.est for r in rows} == expected
        assert all(r.est >= r.exact for r in rows)
        grid = df.groupBy("tok").count().transform(
            count_min_sketch("tok", depth, width, count_col="count")
        ).collect()
        # Every sketch row conserves the total occurrence count.
        per_row = Counter()
        for cell in grid:
            per_row[cell.row] += cell.cnt
        assert all(v == len(occurrences) for v in per_row.values())

    run()
