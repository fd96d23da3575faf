"""k-means (ml/clustering.py): semantic separation, determinism, and
empty-input contracts that the bit-exact oracle replay (q76) can't see
— e.g. that the algorithm actually clusters."""

from __future__ import annotations

from btc_usdt_etl_pipeline_spark.ml.clustering import kmeans_assign


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x), float(y)]) for i, (x, y) in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separates_two_blobs(spark):
    # Blob A around (0,0), blob B around (100,100); seeds are the two
    # lowest ids — one from each blob by construction.
    a = [(0.0, 0.1), (0.2, 0.0), (0.1, 0.3), (0.3, 0.2)]
    b = [(100.0, 100.1), (100.2, 100.0), (99.9, 100.3)]
    df = _points(spark, [a[0], b[0]] + a[1:] + b[1:])
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(df, k=2, iters=3).collect()
    }
    # ids 0,2,3,4 are blob A; ids 1,5,6 blob B
    assert len({got[0], got[2], got[3], got[4]}) == 1
    assert len({got[1], got[5], got[6]}) == 1
    assert got[0] != got[1]


def test_kmeans_deterministic_across_runs(spark):
    rows = [(float(i % 7), float((i * 3) % 5)) for i in range(40)]
    df = _points(spark, rows)
    r1 = sorted((r.vec_id, r.cluster) for r in kmeans_assign(df, k=3).collect())
    r2 = sorted((r.vec_id, r.cluster) for r in kmeans_assign(df, k=3).collect())
    assert r1 == r2


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=4, iters=2)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster"]


def test_kmeans_k_exceeds_rows(spark):
    # 3 vectors, k=5: seeding truncates to the available vectors and
    # the loop still converges with 3 effective clusters.
    df = _points(spark, [(0.0, 0.0), (10.0, 10.0), (20.0, 20.0)])
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, k=5, iters=2).collect()}
    assert set(got) == {0, 1, 2}
    assert len(set(got.values())) == 3  # each point keeps its own seed


def test_grid_density_clusters_reference(spark):
    """Two well-separated dense blobs + scattered noise: blob points
    share a cluster label per blob, labels differ across blobs, noise
    points get null."""
    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.ml.clustering import (
        grid_density_clusters,
    )

    rows = []
    rid = 0
    # blob A around (0.1, 0.1): 20 points inside one eps=0.125 cell
    for i in range(20):
        rows.append((rid, 0.10 + (i % 5) * 0.004, 0.10 + (i // 5) * 0.004)); rid += 1
    # blob B: two ADJACENT dense cells around (1.0, 1.0) — must merge
    for i in range(12):
        rows.append((rid, 1.01 + (i % 4) * 0.004, 1.01 + (i // 4) * 0.004)); rid += 1
    for i in range(12):
        rows.append((rid, 1.135 + (i % 4) * 0.004, 1.01 + (i // 4) * 0.004)); rid += 1
    # noise: isolated singles
    for i in range(5):
        rows.append((rid, 5.0 + i, 5.0 + i)); rid += 1
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {
        r["id"]: r["cluster"]
        for r in df.transform(
            grid_density_clusters(
                "id", F.col("x"), F.col("y"), eps=0.125, min_pts=8
            )
        ).collect()
    }
    blob_a = {out[i] for i in range(20)}
    blob_b = {out[i] for i in range(20, 44)}
    noise = {out[i] for i in range(44, 49)}
    assert len(blob_a) == 1 and None not in blob_a
    assert len(blob_b) == 1 and None not in blob_b  # adjacent cells merged
    assert blob_a != blob_b
    assert noise == {None}


def test_grid_density_rejects_bad_min_pts(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.ml.clustering import (
        grid_density_clusters,
    )

    with _pytest.raises(ValueError):
        grid_density_clusters("id", F.col("x"), F.col("y"), min_pts=0)
