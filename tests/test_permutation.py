"""Semantic tests for the randomization (permutation) test: an exact
python replay of the portable md5 relabeling, plus the planted-shift /
null-data behavior."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F


def _h24(ident, r):
    hv = int(hashlib.md5(f"{ident}:{r}".encode()).hexdigest()[:15], 16)
    return (hv & 0xFFFFFF) / 16777216.0


def _perm_py(rows, B):
    """rows: (id, x, a). Exact replay of the operator."""
    n = len(rows)
    na = sum(1 for _, _, a in rows if a)
    sa = sum(x for _, x, a in rows if a)
    sb = sum(x for _, x, a in rows if not a)
    dobs = sa / na - sb / (n - na)
    pa = na / n
    extreme = valid = 0
    for r in range(B):
        ra = ca = rb = cb = 0.0
        for ident, x, _ in rows:
            if _h24(ident, r) < pa:
                ra += x
                ca += 1
            else:
                rb += x
                cb += 1
        if ca == 0 or cb == 0:
            continue
        valid += 1
        if abs(ra / ca - rb / cb) >= abs(dobs):
            extreme += 1
    return dobs, valid, extreme, (extreme + 1) / (valid + 1)


def test_permutation_matches_exact_python_replay(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        permutation_test_diff,
    )

    rng = random.Random(101)
    rows = [
        (i, rng.gauss(0, 1) + (0.15 if i % 2 == 0 else 0.0), i % 2 == 0)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        [("g", *r) for r in rows], "g string, id long, x double, a boolean"
    )
    r = df.transform(
        permutation_test_diff(
            "x", "id", F.col("a"), partition_by="g", replicates=25,
            portable=True,
        )
    ).collect()[0]
    dobs, valid, extreme, p = _perm_py(rows, 25)
    assert r["n"] == 300 and r["n_a"] == 150
    assert r["diff_obs"] == pytest.approx(dobs, abs=2e-6)
    assert r["n_replicates"] == valid
    assert r["n_extreme"] == extreme
    assert r["p_value"] == pytest.approx(p, abs=1e-6)


def test_permutation_planted_effect_vs_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        permutation_test_diff,
    )

    rng = random.Random(103)
    # strong planted shift → p at the floor 1/(B+1)
    shifted = [
        ("g", i, rng.gauss(0, 1) + (3.0 if i % 2 == 0 else 0.0),
         i % 2 == 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        shifted, "g string, id long, x double, a boolean"
    )
    r = df.transform(
        permutation_test_diff("x", "id", F.col("a"), partition_by="g",
                              replicates=40, portable=True)
    ).collect()[0]
    assert r["n_extreme"] == 0
    assert r["p_value"] == pytest.approx(1 / 41, abs=1e-6)

    # pure null → p must NOT be small
    null_rows = [
        ("g", i, rng.gauss(0, 1), i % 2 == 0) for i in range(400)
    ]
    df2 = spark.createDataFrame(
        null_rows, "g string, id long, x double, a boolean"
    )
    r2 = df2.transform(
        permutation_test_diff("x", "id", F.col("a"), partition_by="g",
                              replicates=40, portable=True)
    ).collect()[0]
    assert r2["p_value"] > 0.05


def test_permutation_degenerate_one_side(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        permutation_test_diff,
    )

    rows = [("g", i, float(i), True) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long, x double, a boolean")
    r = df.transform(
        permutation_test_diff("x", "id", F.col("a"), partition_by="g",
                              replicates=10, portable=True)
    ).collect()[0]
    assert r["diff_obs"] is None and r["p_value"] is None
    assert r["n_a"] == 20 and r["n_replicates"] == 0
