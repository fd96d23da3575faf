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
