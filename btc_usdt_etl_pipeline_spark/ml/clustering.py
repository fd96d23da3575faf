"""Lloyd's k-means as an iterative DataFrame algorithm.

The reference has no clustering (its ML stack is an LSTM regression,
``components/model/training.py``); this is north-star surface for the
training-data pipeline: cluster embeddings to balance a corpus, pick
diverse samples, or seed IVF cells (``operators/similarity.py``).

Design for 100 TB:

- **Centroids are broadcast as plan literals.**  k·dim doubles embedded
  in the assignment expression — the per-iteration "model" rides the
  closure, so assignment is a map-only stage: one pass over the vectors,
  no join, no shuffle.
- **The update is one partial-aggregated shuffle per iteration.**
  ``posexplode`` → ``groupBy(cluster, dim)`` collapses each scan
  partition to ≤ k·dim rows map-side (same exploded-layout argument as
  the q61 centroids), so the exchange is KBs regardless of input size.
- **The driver sync per iteration is k·dim values** — the irreducible
  Lloyd barrier (Spark MLlib's KMeans does the same via collect); it is
  metadata-scale, not data-scale.
- **Every float reduction is order-insensitive.**  Squared-distance
  terms and coordinate sums are cast to decimal per element before
  summation, so results are bit-identical under any partitioning/merge
  order — which is also what makes the whole iterative algorithm
  DuckDB-oracle-replayable (q76), rare for distributed k-means.

Determinism: init = the vectors of the k lowest ids (no RNG state to
replay); distance ties pick the lowest cluster id; empty clusters keep
their previous centroid (standard Lloyd fallback).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 12dp keeps discrimination between near-equal squared distances; the
#: coordinate sums reuse the engine-wide 6dp idiom (functions.DEC).
#: Term (20,12) + accumulator (30,12): every fold addition widens to
#: (31,12) — NO precision loss, no rounding — then recasts to (30,12),
#: which is exact while |sum| < 10^18.  (A (38,12) accumulator would
#: make Spark shrink the merge result to scale 11, silently rounding
#: each step — the type checker rejects it, and rightly so.)
DEC_TERM = "decimal(20,12)"
DEC_ACC = "decimal(30,12)"
DEC6 = "decimal(38,6)"


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    """Exact-decimal squared L2 distance between an array<double> column
    and a literal centroid.  Each (x-c)^2 term is an IEEE double product
    (identical on any engine) cast to decimal BEFORE the fold, so the
    sum is exact and order-free."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    terms = F.zip_with(
        vec, lit, lambda x, c: ((x - c) * (x - c)).cast(DEC_TERM)
    )
    return F.aggregate(
        terms,
        F.lit(0).cast(DEC_ACC),
        lambda acc, t: (acc + t).cast(DEC_ACC),
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment
    ``(id_col, cluster)``.  See module docstring for the scale shape."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "_v"
        ),
    ).persist()
    try:
        seeds = base.orderBy("_id").limit(k).collect()
        if not seeds:
            return df.sparkSession.createDataFrame(
                [], f"{id_col} long, cluster int"
            )
        centroids: dict[int, list[float]] = {
            cid: list(r._v) for cid, r in enumerate(seeds)
        }
        assigned = None
        for it in range(iters):
            dists = F.array(
                *[_sqdist(F.col("_v"), centroids[c]) for c in sorted(centroids)]
            )
            cluster = (
                F.array_position(dists, F.array_min(dists)) - 1
            ).cast("int")
            assigned = base.select(
                "_id", "_v", cluster.alias("cluster")
            )
            if it == iters - 1:
                break  # final assignment needs no further update
            # Update: exploded layout, decimal-exact partial sums; the
            # mean is CAST(sum AS DOUBLE)/n — double division, never
            # decimal division (engines round decimal quotients
            # differently).
            rows = (
                assigned.select(
                    "cluster", F.posexplode("_v").alias("i", "x")
                )
                .groupBy("cluster", "i")
                .agg(
                    (
                        F.sum(F.col("x").cast(DEC6)).cast("double")
                        / F.count(F.lit(1))
                    ).alias("c")
                )
                .collect()
            )
            fresh: dict[int, dict[int, float]] = {}
            for r in rows:
                fresh.setdefault(r.cluster, {})[r.i] = r.c
            for cid, by_dim in fresh.items():
                centroids[cid] = [
                    by_dim[i] for i in range(len(by_dim))
                ]
            # clusters absent from `fresh` (emptied out) keep their
            # previous centroid
        return assigned.select(
            F.col("_id").alias(id_col), "cluster"
        )
    finally:
        base.unpersist()


def grid_density_clusters(
    id_col: str,
    x: F.Column,
    y: F.Column,
    eps: float = 0.125,
    min_pts: int = 8,
) -> Callable[[DataFrame], DataFrame]:
    """Grid-based density clustering (the STING/grid-DBSCAN shape):
    snap points to an ``eps``-sized grid, keep cells with ≥ ``min_pts``
    points (density test), connect 8-adjacent dense cells, and label
    each point with its component's min cell id; points in sparse cells
    are noise (``cluster`` null).  This is the scalable stand-in for
    DBSCAN on Spark: exact DBSCAN's ε-neighborhood query is a distance
    self-join, while the grid pays one cell aggregation (map-side
    partial — at most |cells| rows survive), one |dense-cells|-scale
    8-neighbor equi-join, and the label-propagation connected
    components — all keyed, nothing quadratic in points.  The
    approximation is the usual one: cell granularity decides borders
    (a DBSCAN border point whose cell is sparse becomes noise).

    Determinism/oracle: cell = ``floor(coord / eps)``; pick ``eps`` a
    power of two so the division is an exact binary scale and the cell
    assignment replays bit-for-bit in any engine.  Cell ids pack as
    ``(cx + 2^20)·2^21 + (cy + 2^20)`` — exact for \\|cx\\|,\\|cy\\| < 2^20,
    i.e. coordinates within ±2^20·eps.
    """
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    bias = 1 << 20
    pack = 1 << 21

    def cell_id(cx: F.Column, cy: F.Column) -> F.Column:
        return (cx + bias) * pack + (cy + bias)

    def _t(df: DataFrame) -> DataFrame:
        from btc_usdt_etl_pipeline_spark.operators.graph import (
            connected_components,
        )

        pts = df.select(
            F.col(id_col),
            F.floor(x / F.lit(float(eps))).cast("long").alias("_cx"),
            F.floor(y / F.lit(float(eps))).cast("long").alias("_cy"),
        ).withColumn("_cell", cell_id(F.col("_cx"), F.col("_cy")))
        dense = (
            pts.groupBy("_cell", "_cx", "_cy")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_pts)
        )
        offsets = F.array(
            *[
                F.struct(
                    F.lit(dx).alias("dx"), F.lit(dy).alias("dy")
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
            ]
        )
        nb = dense.select(
            F.col("_cell").alias("id_a"), "_cx", "_cy",
            F.explode(offsets).alias("_o"),
        ).select(
            "id_a",
            cell_id(
                F.col("_cx") + F.col("_o.dx"),
                F.col("_cy") + F.col("_o.dy"),
            ).alias("id_b"),
        )
        edges = nb.join(
            dense.select(F.col("_cell").alias("id_b")), "id_b"
        ).where(F.col("id_a") < F.col("id_b"))
        # Star contraction, not label propagation: a dense-cell graph
        # is a GRID, whose diameter grows with the corpus (a 10×
        # embedding cloud already chains >64 cells), so diameter-bound
        # label rounds diverge while star contraction halves components
        # per round (O(log n) — the q119 argument).
        comp = connected_components(edges, algorithm="star")
        cellmap = (
            dense.select("_cell")
            .join(
                comp.select(
                    F.col("node").alias("_cell"),
                    F.col("component").alias("_comp"),
                ),
                "_cell",
                "left",
            )
            .select(
                "_cell",
                F.coalesce(F.col("_comp"), F.col("_cell")).alias(
                    "cluster"
                ),
            )
        )
        return pts.join(cellmap, "_cell", "left").select(
            id_col, "cluster"
        )

    return _t


def pq_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Product Quantization (Jégou et al., TPAMI'11): split each vector
    into ``m`` contiguous ``sub_dim``-dim subvectors, k-means each
    subspace independently, and encode the vector as its m centroid
    ids — the compression behind every billion-scale ANN index
    (FAISS IVF-PQ): 64 floats (256 B) become m·log2(k) bits, and
    asymmetric distances are m table lookups instead of a 64-dim dot.

    Each subspace runs the engine's deterministic Lloyd's
    (:func:`kmeans_assign`): decimal-exact distances, k-lowest-id
    init, lowest-id tie-breaks — so the ENTIRE codebook training +
    encoding is bit-reproducible and SQL-oracle-replayable, which is
    not true of any RNG-seeded PQ.  Scale shape inherits from
    kmeans_assign (map-only assignment with centroid literals, KB-
    scale update shuffles); the m subspace runs are sequential but
    each touches only its slice, and the final code join is id-keyed.

    Returns ``(id_col, code_0..code_{m-1}, pq_code)`` with ``pq_code``
    the base-k packed integer.
    """
    out = None
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias(
                "_sub"
            ),
        )
        a = kmeans_assign(
            sub, vec_col="_sub", id_col=id_col, k=k, iters=iters
        ).withColumnRenamed("cluster", f"code_{s}")
        out = a if out is None else out.join(a, id_col)
    packed = None
    for s in range(m):
        term = F.col(f"code_{s}") * F.lit(k**s)
        packed = term if packed is None else packed + term
    return out.withColumn("pq_code", packed.cast("int"))
