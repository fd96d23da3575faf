"""Tests: interval algebra, data-layout (zone pruning, compaction), skyline."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.intervals import (
    interval_coverage,
    interval_gaps,
    merge_intervals,
)
from btc_usdt_etl_pipeline_spark.operators.layout import (
    compaction_plan,
    files_scanned,
    skipping_stats,
)
from btc_usdt_etl_pipeline_spark.operators.relational import skyline_2d


def _py_merge(intervals, touching=True):
    """Reference interval-union merge."""
    out = []
    for s, e in sorted(intervals):
        if out and (s <= out[-1][1] if touching else s < out[-1][1]):
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@pytest.fixture(scope="module")
def iv_df(spark):
    rng = random.Random(42)
    rows = [
        (k, s, s + rng.randint(1, 40))
        for k in range(8)
        for s in (rng.randint(0, 300) for _ in range(60))
    ]
    return (
        spark.createDataFrame(rows, "k int, s long, e long"),
        rows,
    )


def test_merge_matches_python_reference(iv_df):
    df, rows = iv_df
    got = {
        (r["k"], r["span_start"], r["span_end"])
        for r in df.transform(
            merge_intervals(["k"], "s", "e")
        ).collect()
    }
    want = set()
    for k in range(8):
        for s, e in _py_merge([(s, e) for kk, s, e in rows if kk == k]):
            want.add((k, s, e))
    assert got == want


def test_merge_no_touching(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 10, 20), (1, 25, 30)], "k int, s long, e long"
    )
    spans = df.transform(
        merge_intervals(["k"], "s", "e", merge_touching=False)
    ).collect()
    assert len(spans) == 3  # touching at 10 stays split
    spans = df.transform(merge_intervals(["k"], "s", "e")).collect()
    assert len(spans) == 2  # default merges the touch


def test_coverage_and_gaps_partition_the_hull(iv_df):
    """covered + gap lengths == hull span, per key (complement law)."""
    df, rows = iv_df
    cov = {
        r["k"]: r["covered"]
        for r in df.transform(
            interval_coverage(["k"], "s", "e")
        ).collect()
    }
    gaps = df.transform(interval_gaps(["k"], "s", "e")).collect()
    gap_tot = {}
    for r in gaps:
        gap_tot[r["k"]] = gap_tot.get(r["k"], 0) + (
            r["gap_end"] - r["gap_start"]
        )
        assert r["gap_end"] > r["gap_start"]
    for k in range(8):
        ks = [(s, e) for kk, s, e in rows if kk == k]
        hull = max(e for _, e in ks) - min(s for s, _ in ks)
        assert cov[k] + gap_tot.get(k, 0) == hull


def test_interval_counts_conserved(iv_df):
    df, rows = iv_df
    out = df.transform(interval_coverage(["k"], "s", "e")).collect()
    assert sum(r["n_intervals"] for r in out) == len(rows)


@pytest.fixture(scope="module")
def file_df(spark):
    rng = random.Random(7)
    rows = [
        (p, f, rng.randint(100, 5000))
        for p in ("a", "b")
        for f in range(200)
    ]
    return spark.createDataFrame(rows, "part string, fid long, bytes long")


def test_compaction_bins_reach_target_and_conserve(file_df):
    target = 20_000
    plan = file_df.transform(
        compaction_plan(["part"], "fid", "bytes", target)
    ).collect()
    by_part = {}
    for r in plan:
        by_part.setdefault(r["part"], []).append(r)
    total = sum(r["total_bytes"] for r in plan)
    assert total == sum(r["bytes"] for r in file_df.collect())
    for part, bins in by_part.items():
        bins.sort(key=lambda r: r["bin"])
        # bins are contiguous file-id ranges (adjacent coalescing)
        for a, b in zip(bins, bins[1:]):
            assert a["last_file"] < b["first_file"]
        # every closed bin ends at-or-above target, and none exceeds
        # target + max single file
        max_file = 5000
        for r in bins[:-1]:
            assert r["total_bytes"] >= target - max_file
            assert r["total_bytes"] <= target + max_file


def test_zone_pruning_is_sound(spark):
    """Zone-map test never prunes a file that holds a matching row."""
    rng = random.Random(3)
    rows = [
        (rng.randint(0, 63), rng.randint(0, 1000), rng.randint(0, 1000))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "fid long, x long, y long")
    stats = df.transform(skipping_stats("fid", ["x", "y"]))
    lo, hi = 200, 260
    out = files_scanned(stats, {"x": (lo, hi)}).collect()[0]
    # every row matching the predicate lives in a scanned file
    matching_files = {f for f, x, _ in rows if lo <= x <= hi}
    assert out["files_scanned"] >= len(matching_files)
    assert out["rows_scanned"] >= sum(1 for _, x, _ in rows if lo <= x <= hi)
    assert out["n_files"] == len({f for f, _, _ in rows})


def _py_skyline(pts, min_x=True, max_y=True):
    def dom(a, b):
        bx, by = b
        ax, ay = a
        if not min_x:
            ax, bx = -ax, -bx
        if not max_y:
            ay, by = -ay, -by
        return bx <= ax and by >= ay and (bx < ax or by > ay)

    return sorted(p for p in pts if not any(dom(p, q) for q in pts))


@pytest.mark.parametrize("min_x,max_y", [(True, True), (False, False)])
def test_skyline_matches_brute_force(spark, min_x, max_y):
    rng = random.Random(11)
    pts = [
        (float(rng.randint(0, 100)), float(rng.randint(0, 100)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted(
        (r["x"], r["y"])
        for r in df.transform(
            skyline_2d("x", "y", minimize_x=min_x, maximize_y=max_y,
                       num_buckets=16)
        ).collect()
    )
    assert got == _py_skyline(pts, min_x, max_y)


def test_skyline_keeps_equal_duplicates(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 5.0), (2.0, 4.0)], "x double, y double"
    )
    out = df.transform(skyline_2d("x", "y")).collect()
    assert len(out) == 2  # both copies of the frontier point survive


def test_skyline_constant_x(spark):
    df = spark.createDataFrame(
        [(3.0, float(y)) for y in range(10)], "x double, y double"
    )
    out = df.transform(skyline_2d("x", "y")).collect()
    assert [(r["x"], r["y"]) for r in out] == [(3.0, 9.0)]
