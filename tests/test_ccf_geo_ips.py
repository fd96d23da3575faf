"""Semantic tests for the round-8 additions: cross-correlation
(lead-lag), grid-bucketed radius join, and IPS/SNIPS off-policy
evaluation — numpy/brute-force references on small inputs plus each
operator's defining invariants (planted-lag peak, grid == brute force,
clip accounting)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def test_cross_correlation_matches_numpy_and_planted_lag(spark):
    import numpy as np

    from btc_usdt_etl_pipeline_spark.operators.windows import (
        cross_correlation,
    )

    rng = random.Random(5)
    n, shift = 120, 3
    x = [rng.gauss(0, 1) for _ in range(n)]
    # y is x delayed by `shift` plus small noise → CCF peaks at +shift
    y = [
        (x[i - shift] if i >= shift else 0.0) + 0.01 * rng.gauss(0, 1)
        for i in range(n)
    ]
    rows = [(1, i, x[i], y[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, t long, x double, y double")
    got = {
        r["lag"]: r["ccf"]
        for r in df.transform(
            cross_correlation(
                "x", "y", max_lag=5, partition_by="k", order_by=("t",)
            )
        ).collect()
    }
    assert set(got) == set(range(-5, 6))

    xa, ya = np.array(x), np.array(y)
    dx, dy = xa - xa.mean(), ya - ya.mean()
    den = math.sqrt((dx * dx).sum() * (dy * dy).sum())

    def ref(k: int) -> float:
        if k >= 0:
            return float((dx[: n - k] * dy[k:]).sum() / den)
        return float((dx[-k:] * dy[: n + k]).sum() / den)

    for k in range(-5, 6):
        assert got[k] == pytest.approx(ref(k), abs=2e-6), k
    # the planted lead shows up exactly where it was planted
    assert max(got, key=lambda k: got[k]) == shift
    assert got[shift] > 0.9


def test_cross_correlation_constant_series_is_null(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        cross_correlation,
    )

    rows = [(1, i, 7.0, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, t long, x double, y double")
    out = df.transform(
        cross_correlation("x", "y", max_lag=2, partition_by="k",
                          order_by=("t",))
    ).collect()
    assert len(out) == 5 and all(r["ccf"] is None for r in out)


def test_radius_join_equals_brute_force(spark):
    from btc_usdt_etl_pipeline_spark.operators.geo import radius_join

    rng = random.Random(17)
    left = [(i, rng.uniform(-80, 80), rng.uniform(-170, 170))
            for i in range(150)]
    right = [(j, rng.uniform(-80, 80), rng.uniform(-170, 170))
             for j in range(60)]
    ldf = spark.createDataFrame(left, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(right, "rid long, rlat double, rlon double")
    r = 12.0
    got = {
        (row["lid"], row["rid"])
        for row in radius_join(
            ldf, rdf, radius_deg=r,
            left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
        ).collect()
    }
    want = {
        (i, j)
        for (i, la, lo) in left
        for (j, ra, ro) in right
        if (la - ra) ** 2 + (lo - ro) ** 2 < r * r
    }
    assert got == want and len(want) > 50

    # boundary is STRICT: a pair at exactly radius² is excluded
    l2 = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, lat double, lon double")
    r2 = spark.createDataFrame([(9, 3.0, 4.0)], "rid long, rlat double, rlon double")
    assert radius_join(
        l2, r2, radius_deg=5.0,
        left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
    ).count() == 0
    # ...and just inside is kept
    assert radius_join(
        l2, r2, radius_deg=5.0001,
        left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
    ).count() == 1

    with pytest.raises(ValueError, match="radius"):
        radius_join(ldf, rdf, radius_deg=0.0)
    with pytest.raises(ValueError, match="cell_size"):
        radius_join(ldf, rdf, radius_deg=5.0, cell_size_deg=1.0)


def test_nearest_join_matches_brute_force_and_tiebreak(spark):
    from btc_usdt_etl_pipeline_spark.operators.geo import nearest_join

    rng = random.Random(23)
    left = [(i, rng.uniform(-40, 40), rng.uniform(-40, 40))
            for i in range(80)]
    right = [(j, rng.uniform(-40, 40), rng.uniform(-40, 40))
             for j in range(25)]
    ldf = spark.createDataFrame(left, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(right, "rid long, rlat double, rlon double")
    r = 15.0
    got = {
        row["lid"]: (row["rid"], row["nn_rank"])
        for row in nearest_join(
            ldf, rdf, left_id="lid", radius_deg=r, k=1,
            left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
            tiebreak="rid",
        ).collect()
    }
    for (i, la, lo) in left:
        cands = sorted(
            ((la - ra) ** 2 + (lo - ro) ** 2, j)
            for (j, ra, ro) in right
            if (la - ra) ** 2 + (lo - ro) ** 2 < r * r
        )
        if not cands:
            assert i not in got  # unmatched rows are absent
        else:
            assert got[i] == (cands[0][1], 1), i

    # k=2 returns ranked pairs
    two = nearest_join(
        ldf, rdf, left_id="lid", radius_deg=r, k=2,
        left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
        tiebreak="rid",
    ).collect()
    by_left = {}
    for row in two:
        by_left.setdefault(row["lid"], []).append(
            (row["nn_rank"], row["dist2"])
        )
    for ranks in by_left.values():
        ranks.sort()
        assert [r0 for r0, _ in ranks] == list(range(1, len(ranks) + 1))
        dists = [d for _, d in ranks]
        assert dists == sorted(dists)

    # exact tie broken by the tiebreak column: two candidates at the
    # same distance -> the lower rid wins
    l1 = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, lat double, lon double")
    r1 = spark.createDataFrame(
        [(7, 3.0, 0.0), (5, -3.0, 0.0)], "rid long, rlat double, rlon double"
    )
    (row,) = nearest_join(
        l1, r1, left_id="lid", radius_deg=4.0, k=1,
        left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
        tiebreak="rid",
    ).collect()
    assert row["rid"] == 5


def test_interpolate_linear_matches_reference(spark):
    from btc_usdt_etl_pipeline_spark.operators.windows import (
        interpolate_linear,
    )

    # irregular time axis, interior gaps of length 1 and 2, leading
    # and trailing nulls, a second key with no gaps, and a duplicate-
    # anchor-time fallback.
    rows = [
        ("a", 0.0, None),      # leading: stays null
        ("a", 1.0, 10.0),
        ("a", 3.0, None),      # interior: 10 + (40-10)*(3-1)/(5-1) = 25
        ("a", 5.0, 40.0),
        ("a", 6.0, None),      # 2-gap first: 40 + (10-40)*(6-5)/(9-5)
        ("a", 7.0, None),      # 2-gap second
        ("a", 9.0, 10.0),
        ("a", 11.0, None),     # trailing: stays null
        ("b", 0.0, 1.0),
        ("b", 1.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in df.transform(
            interpolate_linear(
                "v", "t", partition_by=["k"], order_by=("t",),
                out="filled",
            )
        ).collect()
    }
    assert got[("a", 0.0)] is None
    assert got[("a", 3.0)] == pytest.approx(25.0, abs=1e-12)
    assert got[("a", 6.0)] == pytest.approx(40 + (10 - 40) * 1 / 4, abs=1e-12)
    assert got[("a", 7.0)] == pytest.approx(40 + (10 - 40) * 2 / 4, abs=1e-12)
    assert got[("a", 11.0)] is None
    # non-null rows pass through untouched
    assert got[("a", 1.0)] == 10.0 and got[("b", 0.0)] == 1.0

    # duplicate anchor timestamps: zero gap falls back to prev value
    dup = spark.createDataFrame(
        [("c", 1.0, 1, 5.0), ("c", 1.0, 2, None), ("c", 1.0, 3, 9.0)],
        "k string, t double, seq int, v double",
    )
    (mid,) = [
        r["filled"]
        for r in dup.transform(
            interpolate_linear(
                "v", "t", partition_by=["k"], order_by=("t", "seq"),
                out="filled",
            )
        ).collect()
        if r["seq"] == 2
    ]
    assert mid == 5.0


def test_segment_overlap_hand_computed(spark):
    from btc_usdt_etl_pipeline_spark.operators.relational import (
        segment_overlap,
    )

    # A={1,2,3,4}, B={3,4,5}, C={3}  (C ⊂ A ∩ B), D={9} (disjoint)
    rows = (
        [("A", m) for m in (1, 2, 3, 4)]
        + [("B", m) for m in (3, 4, 5)]
        + [("C", m) for m in (3,)]
        + [("D", m) for m in (9,)]
        + [("A", 1)]  # duplicate membership must not inflate counts
    )
    df = spark.createDataFrame(rows, "seg string, mem long")
    got = {
        (r["seg_a"], r["seg_b"]): r
        for r in df.transform(segment_overlap("seg", "mem")).collect()
    }
    ab = got[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (4, 3, 2)
    assert ab["jaccard"] == 2 / 5 and ab["overlap"] == 2 / 3
    ac = got[("A", "C")]
    assert ac["overlap"] == 1.0  # containment: C inside A
    assert ac["jaccard"] == 1 / 4
    # disjoint D produces no row with anyone
    assert all("D" not in k for k in got)
    # min_members fence drops the singletons BEFORE pairing
    fenced = {
        (r["seg_a"], r["seg_b"])
        for r in df.transform(
            segment_overlap("seg", "mem", min_members=2)
        ).collect()
    }
    assert fenced == {("A", "B")}


def test_ols_closed_form_matches_numpy(spark):
    import numpy as np

    from btc_usdt_etl_pipeline_spark.ml.features import ols_closed_form

    rng = random.Random(29)
    rows = []
    # group "exact": planted y = 3 + 2*x1 - 0.5*x2, zero noise -> exact
    # recovery, r2 = 1
    for i in range(60):
        x1, x2 = float(i % 13), float((i * 7) % 5)
        rows.append(("exact", x1, x2, 3.0 + 2.0 * x1 - 0.5 * x2))
    # group "noisy": numpy lstsq reference
    for i in range(200):
        x1 = float(rng.randint(0, 23))
        x2 = float(rng.randint(1, 7))
        y = 1.5 + 0.3 * x1 - 0.2 * x2 + rng.gauss(0, 1)
        rows.append(("noisy", x1, x2, round(y, 6)))
    # group "singular": x2 = 2*x1 (collinear) -> NULL betas
    for i in range(40):
        x1 = float(i % 9)
        rows.append(("singular", x1, 2.0 * x1, float(i)))
    df = spark.createDataFrame(rows, "k string, x1 double, x2 double, y double")
    got = {
        r["k"]: r
        for r in df.transform(
            ols_closed_form("y", ["x1", "x2"], group_by="k")
        ).collect()
    }
    e = got["exact"]
    assert (e["b0"], e["b1"], e["b2"], e["r2"]) == (3.0, 2.0, -0.5, 1.0)
    s = got["singular"]
    assert s["b0"] is None and s["b1"] is None and s["b2"] is None

    sub = [(x1, x2, y) for k, x1, x2, y in rows if k == "noisy"]
    X = np.array([[1.0, a, b] for a, b, _ in sub])
    Y = np.array([y for _, _, y in sub])
    beta, *_ = np.linalg.lstsq(X, Y, rcond=None)
    nz = got["noisy"]
    assert nz["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert nz["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert nz["b2"] == pytest.approx(beta[2], abs=1e-4)
    pred = X @ beta
    sst = ((Y - Y.mean()) ** 2).sum()
    r2_ref = 1 - ((Y - pred) ** 2).sum() / sst
    assert nz["r2"] == pytest.approx(r2_ref, abs=1e-4)

    # one-regressor variant vs numpy polyfit
    one = df.filter(F.col("k") == "noisy").transform(
        ols_closed_form("y", ["x1"], group_by="k")
    ).collect()[0]
    m, c = np.polyfit([a for a, _, _ in sub], Y, 1)
    assert one["b1"] == pytest.approx(m, abs=1e-4)
    assert one["b0"] == pytest.approx(c, abs=1e-4)

    with pytest.raises(ValueError, match="regressors"):
        ols_closed_form("y", ["a", "b", "c", "d", "e", "f", "g"])


def test_ols_elimination_matches_numpy_k3_to_k6(spark):
    """Round-9 generalization: 3-6 regressors solve by the GENERATED
    Gaussian-elimination schedule (one generator feeding both the Spark
    withColumn chain and the DuckDB oracle).  numpy lstsq is the
    reference at every k; a collinear system yields NULL betas through
    the zero-pivot fence."""
    import numpy as np

    from btc_usdt_etl_pipeline_spark.ml.features import (
        ols_closed_form,
        ols_elimination_formulas,
    )

    rng = np.random.default_rng(43)
    for k in (3, 4, 5, 6):
        X = rng.normal(size=(300, k)) * 3.0
        beta = np.arange(k + 1, dtype=float) - k / 2.0
        Y = beta[0] + X @ beta[1:] + rng.normal(scale=0.05, size=300)
        cols = [f"x{i+1}" for i in range(k)]
        rows = [
            tuple(float(v) for v in X[i]) + (float(Y[i]),)
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows, ", ".join(f"{c} double" for c in cols) + ", y double"
        )
        got = df.transform(ols_closed_form("y", cols)).collect()[0]
        A = np.column_stack([np.ones(300), X])
        ref, *_ = np.linalg.lstsq(A, Y, rcond=None)
        for i in range(k + 1):
            assert got[f"b{i}"] == pytest.approx(ref[i], abs=1e-4), (
                k, i,
            )
        pred = A @ ref
        r2_ref = 1 - ((Y - pred) ** 2).sum() / ((Y - Y.mean()) ** 2).sum()
        assert got["r2"] == pytest.approx(r2_ref, abs=1e-4)

    # DUPLICATE column (x3 = x2 bit-for-bit): rows 2 and 3 of the
    # system stay identical through every elimination update, so the
    # final pivot is EXACTLY zero -> every beta NULL.  (A merely
    # collinear combination like x3 = x1 + x2 leaves a ~1e-6 pivot
    # after the 6 dp decimal moment rounding — the documented limit of
    # the exact-zero fence.)
    Xc = rng.normal(size=(100, 2))
    rows = [
        (float(a), float(b), float(b), float(a - b)) for a, b in Xc
    ]
    dfc = spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, y double"
    )
    sing = dfc.transform(
        ols_closed_form("y", ["x1", "x2", "x3"])
    ).collect()[0]
    assert all(sing[f"b{i}"] is None for i in range(4))

    # the schedule itself is engine-agnostic text: replay it in DuckDB
    # over the same moments and compare to Spark bit-for-bit at 6 dp
    import duckdb

    k = 3
    X = rng.normal(size=(150, k))
    Y = 2.0 - X[:, 0] + 0.5 * X[:, 1] + 3.0 * X[:, 2]
    rows = [
        tuple(float(v) for v in X[i]) + (float(Y[i]),)
        for i in range(150)
    ]
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, y double"
    )
    got = df.transform(ols_closed_form("y", ["x1", "x2", "x3"]))
    gr = got.collect()[0]
    lateral = ", ".join(
        f"{t} AS {n}" for n, t in ols_elimination_formulas(3)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (x1 DOUBLE, x2 DOUBLE, x3 DOUBLE, y DOUBLE)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?)", rows)
    moments = """
      SELECT COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS _sy,
        CAST(SUM(CAST(x1 AS DECIMAL(38,6))) AS DOUBLE) AS _sx1,
        CAST(SUM(CAST(x1*y AS DECIMAL(38,6))) AS DOUBLE) AS _sx1y,
        CAST(SUM(CAST(x1*x1 AS DECIMAL(38,6))) AS DOUBLE) AS _sx1_1,
        CAST(SUM(CAST(x1*x2 AS DECIMAL(38,6))) AS DOUBLE) AS _sx1_2,
        CAST(SUM(CAST(x1*x3 AS DECIMAL(38,6))) AS DOUBLE) AS _sx1_3,
        CAST(SUM(CAST(x2 AS DECIMAL(38,6))) AS DOUBLE) AS _sx2,
        CAST(SUM(CAST(x2*y AS DECIMAL(38,6))) AS DOUBLE) AS _sx2y,
        CAST(SUM(CAST(x2*x2 AS DECIMAL(38,6))) AS DOUBLE) AS _sx2_2,
        CAST(SUM(CAST(x2*x3 AS DECIMAL(38,6))) AS DOUBLE) AS _sx2_3,
        CAST(SUM(CAST(x3 AS DECIMAL(38,6))) AS DOUBLE) AS _sx3,
        CAST(SUM(CAST(x3*y AS DECIMAL(38,6))) AS DOUBLE) AS _sx3y,
        CAST(SUM(CAST(x3*x3 AS DECIMAL(38,6))) AS DOUBLE) AS _sx3_3
      FROM d
    """
    duck = con.execute(
        f"SELECT round(_beta0,6) b0, round(_beta1,6) b1, "
        f"round(_beta2,6) b2, round(_beta3,6) b3 "
        f"FROM (SELECT *, {lateral} FROM ({moments}))"
    ).fetchone()
    assert tuple(gr[f"b{i}"] for i in range(4)) == duck


def test_ips_policy_value_hand_computed(spark):
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        ips_policy_value,
    )

    # logging uniform over 3 arms; target plays only 'a' (p=1.0) →
    # raw weight 3.0, clipped at 2.0.  'c' is outside target support
    # → weight 0.
    rows = [
        (1, "a", 10.0), (2, "a", 20.0),
        (3, "b", 100.0), (4, "c", 1000.0),
    ]
    df = spark.createDataFrame(rows, "i long, arm string, r double")
    log_p = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    (out,) = df.transform(
        ips_policy_value(
            "r", "arm",
            logging_propensity=log_p,
            target_probability={"a": 1.0},
            clip=2.0,
        )
    ).collect()
    # weights: a→2.0 (clipped from 3.0), b→0, c→0
    assert out["n"] == 4
    assert out["ips"] == pytest.approx((2 * 10 + 2 * 20) / 4, abs=1e-6)
    assert out["snips"] == pytest.approx((2 * 10 + 2 * 20) / 4.0, abs=1e-6)
    assert out["avg_weight"] == pytest.approx(4.0 / 4, abs=1e-6)
    assert out["clip_frac"] == pytest.approx(2 / 4, abs=1e-6)

    # unclipped variant: weight 1.5 for 'a' under a milder target
    (out2,) = df.transform(
        ips_policy_value(
            "r", "arm",
            logging_propensity=log_p,
            target_probability={"a": 0.5},
            clip=10.0,
        )
    ).collect()
    assert out2["clip_frac"] == 0.0
    assert out2["ips"] == pytest.approx((1.5 * 30) / 4, abs=1e-6)

    with pytest.raises(ValueError, match="missing"):
        ips_policy_value(
            "r", "arm", logging_propensity={"a": 0.5},
            target_probability={"zzz": 1.0},
        )
    with pytest.raises(ValueError, match="clip"):
        ips_policy_value(
            "r", "arm", logging_propensity=log_p,
            target_probability={"a": 1.0}, clip=0.0,
        )


def test_ips_snips_differ_under_weight_imbalance(spark):
    """SNIPS renormalizes by the realized weight mass: when the target
    overweights a rare arm, IPS and SNIPS must diverge (and SNIPS must
    equal the weighted mean of rewards)."""
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        ips_policy_value,
    )

    # 2 rare rows (not the logging-matched 1) so Σw ≠ n — with counts
    # matching the logging propensities exactly, Σw = n and IPS ≡
    # SNIPS by construction.
    rows = [(i, "rare" if i < 2 else "common",
             50.0 if i < 2 else 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "i long, arm string, r double")
    (out,) = df.transform(
        ips_policy_value(
            "r", "arm",
            logging_propensity={"rare": 0.1, "common": 0.9},
            target_probability={"rare": 0.9, "common": 0.1},
            clip=100.0,
        )
    ).collect()
    w_rare, w_common = 0.9 / 0.1, 0.1 / 0.9
    sw = 2 * w_rare + 8 * w_common
    swr = 2 * w_rare * 50.0 + 8 * w_common * 1.0
    # 1e-4 tolerance, not 1e-6: the operator's order-free decimal sums
    # quantize each weight at 6 dp by contract (w_common = 0.1̄ →
    # 0.111111), which shifts the tiny-mass denominators at ~1e-5.
    assert out["ips"] == pytest.approx(swr / 10, abs=1e-3)
    assert out["snips"] == pytest.approx(swr / sw, abs=1e-3)
    assert abs(out["ips"] - out["snips"]) > 1.0


def test_radius_join_lon_scale_equals_brute_force(spark):
    """Round-9 equirectangular option: lon pre-scaled by cos(lat0),
    membership equals the brute-force scaled metric — each lon scaled
    FIRST, then differenced (the documented op order)."""
    import math

    from btc_usdt_etl_pipeline_spark.operators.geo import radius_join

    rng = random.Random(41)
    sc = math.cos(math.radians(60.0))  # 0.5 exactly-ish
    left = [(i, rng.uniform(40, 80), rng.uniform(-170, 170))
            for i in range(120)]
    right = [(j, rng.uniform(40, 80), rng.uniform(-170, 170))
             for j in range(50)]
    ldf = spark.createDataFrame(left, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(right, "rid long, rlat double, rlon double")
    r = 10.0
    got = {
        (row["lid"], row["rid"])
        for row in radius_join(
            ldf, rdf, radius_deg=r,
            left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
            lon_scale=sc,
        ).collect()
    }
    want = {
        (i, j)
        for (i, la, lo) in left
        for (j, ra, ro) in right
        if (la - ra) ** 2 + (lo * sc - ro * sc) ** 2 < r * r
    }
    assert got == want and len(want) > 20
    # the scaled set genuinely differs from the unscaled one
    unscaled = {
        (i, j)
        for (i, la, lo) in left
        for (j, ra, ro) in right
        if (la - ra) ** 2 + (lo - ro) ** 2 < r * r
    }
    assert got != unscaled

    with pytest.raises(ValueError, match="lon_scale"):
        radius_join(ldf, rdf, radius_deg=r, lon_scale=1.5)
    with pytest.raises(ValueError, match="lon_scale"):
        radius_join(ldf, rdf, radius_deg=r, lon_scale=0.0)


def test_nearest_join_expanding_rings(spark):
    """Round-9 max_rings: unmatched remainder retries at doubled radii;
    a row matched at ring i takes its k nearest within THAT radius and
    never reappears; rows beyond the last ring stay absent."""
    from btc_usdt_etl_pipeline_spark.operators.geo import nearest_join

    left = [
        (1, 0.0, 0.0),    # ring 0: facility at d=1
        (2, 50.0, 50.0),  # ring 1: nearest at d=3 (needs r=4)
        (3, -50.0, -50.0),  # ring 2: nearest at d=6 (needs r=8)
        (4, 80.0, 80.0),  # no facility within 8 -> absent
    ]
    right = [
        (10, 1.0, 0.0), (11, 0.0, 1.5),
        (20, 53.0, 50.0), (21, 50.0, 53.5),
        (30, -56.0, -50.0),
        (40, 80.0, 95.0),
    ]
    ldf = spark.createDataFrame(left, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(right, "rlat_id long, rlat double, rlon double")
    out = {
        r["lid"]: (r["rlat_id"], r["ring"], r["nn_rank"])
        for r in nearest_join(
            ldf, rdf, left_id="lid", radius_deg=2.0, k=1,
            left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
            tiebreak="rlat_id", max_rings=3,
        ).collect()
    }
    assert out == {1: (10, 0, 1), 2: (20, 1, 1), 3: (30, 2, 1)}

    # k=2 at ring 1: BOTH in-radius facilities of the matched ring
    out2 = sorted(
        (r["rlat_id"], r["nn_rank"])
        for r in nearest_join(
            ldf.filter("lid = 2"), rdf, left_id="lid", radius_deg=2.0,
            k=2, left_coords=("lat", "lon"),
            right_coords=("rlat", "rlon"), tiebreak="rlat_id",
            max_rings=2,
        ).collect()
    )
    assert out2 == [(20, 1), (21, 2)]

    # max_rings=1 keeps the old single-ring contract (schema + rows)
    one = nearest_join(
        ldf, rdf, left_id="lid", radius_deg=2.0, k=1,
        left_coords=("lat", "lon"), right_coords=("rlat", "rlon"),
        tiebreak="rlat_id", max_rings=1,
    ).collect()
    assert {r["lid"] for r in one} == {1} and one[0]["ring"] == 0

    with pytest.raises(ValueError, match="max_rings"):
        nearest_join(ldf, rdf, left_id="lid", radius_deg=2.0,
                     max_rings=0)
