"""Geospatial bucketing + radius join — the spatial co-location
primitive (store-to-customer assignment, sensor clustering, POI
dedup).  A naive radius join is a cross product; the classic scale
shape (the same one PostGIS/Sedona grid indexes implement) is:

1. snap every point to a square GRID CELL whose side is ≥ the search
   radius (``cell = floor(coord / cell_size)`` — pure arithmetic, no
   library);
2. explode ONE side into its 3×3 neighbor cells (a bounded ×9
   generator — any point within the radius of a point in cell C lies
   in C's 3×3 neighborhood when the cell side ≥ radius);
3. equi-join on the cell key (a plain hash shuffle — broadcast when
   one side is facility-sized) and apply the EXACT distance predicate
   to the candidates.

Every (left, right) pair is produced at most once: the un-exploded
side keeps its single home cell, and the exploded side contributes at
most one copy to that cell — no post-join dedup.

Determinism: distances are the PLANAR squared-degree metric
``(Δlat)² + (Δlon)²`` — add/multiply only, exactly rounded IEEE ops,
so the predicate is bit-identical cross-engine with NO rounding
contract at all (a haversine refinement is a one-line swap but would
drag sin/cos's per-libm last-ULP drift into the row-membership
boundary; for radius scales where the small-angle approximation is
inadequate, pre-scale the longitude by cos(lat₀) of the region —
still trig-free per row).  Cite: grid-file spatial hashing
(Nievergelt et al. 1984), the standard bucketed spatial join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_cell(lat_col: str, lon_col: str, cell_size_deg: float):
    """Cell coordinates ``(_cy, _cx)`` for a point — floor snapping,
    monotone in each coordinate."""
    return (
        F.floor(F.col(lat_col) / F.lit(float(cell_size_deg))).alias("_cy"),
        F.floor(F.col(lon_col) / F.lit(float(cell_size_deg))).alias("_cx"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_deg: float,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    cell_size_deg: float | None = None,
    dist_col: str = "dist2",
) -> DataFrame:
    """All (left, right) row pairs whose planar squared-degree distance
    is STRICTLY under ``radius_deg²``, via the 3×3 grid candidate join.

    ``cell_size_deg`` defaults to ``radius_deg`` (the smallest side
    that keeps the 3×3 neighborhood sufficient); raise it to trade
    fewer exploded copies against more candidates per cell.  Returns
    ``left.* , right.* , dist_col`` (callers project).  Column names
    must not collide across sides (select/alias first — the engine's
    join-hygiene convention everywhere else).
    """
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    cell = float(cell_size_deg if cell_size_deg is not None else radius_deg)
    if cell < radius_deg:
        raise ValueError(
            "cell_size_deg must be >= radius_deg (3x3 coverage bound)"
        )
    llat, llon = left_coords
    rlat, rlon = right_coords
    # exploded side: each left point lands in its 9 neighbor cells
    lcy = F.floor(F.col(llat) / F.lit(cell))
    lcx = F.floor(F.col(llon) / F.lit(cell))
    nb = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    ).alias("_dy")
    lx = (
        left.select("*", nb)
        .select(
            "*",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias(
                "_dx"
            ),
        )
        .withColumn("_cy", lcy + F.col("_dy"))
        .withColumn("_cx", lcx + F.col("_dx"))
        .drop("_dy", "_dx")
    )
    rx = right.select(
        "*",
        F.floor(F.col(rlat) / F.lit(cell)).alias("_cy"),
        F.floor(F.col(rlon) / F.lit(cell)).alias("_cx"),
    )
    dlat = F.col(llat) - F.col(rlat)
    dlon = F.col(llon) - F.col(rlon)
    d2 = dlat * dlat + dlon * dlon
    r2 = float(radius_deg) * float(radius_deg)
    return (
        lx.join(rx, ["_cy", "_cx"])
        .withColumn(dist_col, d2)
        .filter(F.col(dist_col) < F.lit(r2))
        .drop("_cy", "_cx")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    radius_deg: float,
    k: int = 1,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    tiebreak: str | None = None,
    dist_col: str = "dist2",
) -> DataFrame:
    """k nearest ``right`` rows per ``left`` row WITHIN ``radius_deg``
    — grid-bounded kNN, the facility-assignment / nearest-POI shape.

    The radius bound is the semantics, not a shortcut: a distributed
    UNBOUNDED nearest-neighbor needs expanding-ring retries for
    isolated points (each ring a full candidate join), so the honest
    contract is "nearest within r, unmatched if none" — the caller
    widens r for the unmatched remainder if needed (same explicit-
    fence philosophy as theil_sen's ``max_points``).

    One radius join (grid candidates, never quadratic) + one
    per-left-key ``row_number`` ordered by ``(dist2, tiebreak)`` —
    deterministic under ties when ``tiebreak`` (a unique right-side
    column) is given.  Left rows with no candidate in radius are
    ABSENT from the output (inner semantics — the unmatched set is
    ``left`` anti-join the result).
    """
    from pyspark.sql import Window

    cand = radius_join(
        left, right, radius_deg,
        left_coords=left_coords, right_coords=right_coords,
        dist_col=dist_col,
    )
    order = [F.col(dist_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        cand.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .withColumnRenamed("_rnk", "nn_rank")
    )
