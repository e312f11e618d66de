"""Grid-bucketed eps-connectivity spatial clustering (single-linkage
DBSCAN shape): group points into clusters where any two points within
``eps`` of each other are connected, transitively.

The reference engine has no clustering at all — this is a
brief-relative addition (the "spatial grouping" step a geospatial
training-data pipeline runs to collapse POI/stop duplicates scraped
from many sources into one canonical site, the spatial analogue of
near-dup text clustering). It deliberately reuses the engine's two
proven scale pieces:

  1. the GRID-BUCKET candidate pattern (same shape as the PIP cell
     join and the LSH band join): bin points to square cells of pitch
     exactly ``eps`` — two points within eps are then NEVER more than
     one cell apart in either axis, so replicating one side to its
     3x3 cell neighborhood turns the eps-pair search into a plain
     equi-join on cell id. Candidates per point are bounded by local
     density (9 cells), never by corpus size: no all-pairs, no
     BroadcastNestedLoopJoin, shuffle ~ 9x points. Each qualifying
     pair is produced exactly once (the pair's cell offset (dx, dy)
     is unique, and id_a < id_b kills the mirror);
  2. connected components from the dedup family
     (operators/dedup.dedup_clusters: min-label propagation, exact
     termination, O(diameter) rounds — or the O(log n) star variant
     for adversarial chains).

Distance is PLANAR in coordinate units ((dlon^2 + dlat^2) <= eps^2) —
pure +,-,*: every intermediate is a deterministic IEEE double, so a
SQL oracle reproduces the pair set bit-for-bit (the same reason
embedding LSH quantizes before its matmul). For geodesic eps at
production latitude spans, pre-scale lon by cos(lat0) per latitude
band or swap the refine predicate for haversine — the grid + CC shape
is unchanged; the engine keeps the arithmetic predicate so the
correctness gate is exact rather than transcendental-ulp-dependent.

At 100 TB: the 3x3 replication is map-side (explode of a 9-literal
array); the pair join shuffles on cell id, hash-uniform unless the
data is pathologically hot-spotted (a city with ~everything in one
eps-cell) — for that, the same salting used by pip_join_partitioned
applies per hot cell. CC cost is bounded by the PAIR graph, which the
eps-cap keeps near-linear in points for real densities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asag_spark.operators.dedup import dedup_clusters


def eps_pairs(points: DataFrame, eps: float, id_col: str = "point_id",
              lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """All unordered pairs (id_a < id_b) with planar distance <= eps.
    Grid-bucketed: cell pitch = eps, one side replicated to its 3x3
    neighborhood, equi-join on (cx, cy), exact refine in the join
    condition. Output: (id_a, id_b)."""
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    cx = F.floor(F.col(lon_col) / F.lit(float(eps))).cast("long")
    cy = F.floor(F.col(lat_col) / F.lit(float(eps))).cast("long")
    home = points.select(
        F.col(id_col).alias("_ia"),
        F.col(lon_col).alias("_xa"),
        F.col(lat_col).alias("_ya"),
        cx.alias("_cx"), cy.alias("_cy"),
    )
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    probe = points.select(
        F.col(id_col).alias("_ib"),
        F.col(lon_col).alias("_xb"),
        F.col(lat_col).alias("_yb"),
        cx.alias("_bx"), cy.alias("_by"),
        F.explode(offsets).alias("_o"),
    ).select(
        "_ib", "_xb", "_yb",
        (F.col("_bx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_by") + F.col("_o.dy")).alias("_cy"),
    )
    dx = home["_xa"] - probe["_xb"]
    dy = home["_ya"] - probe["_yb"]
    cond = (
        (home["_cx"] == probe["_cx"]) & (home["_cy"] == probe["_cy"])
        & (home["_ia"] < probe["_ib"])
        & (dx * dx + dy * dy <= F.lit(float(eps) * float(eps)))
    )
    return home.join(probe, cond).select(
        F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b")
    )


def spatial_clusters(points: DataFrame, eps: float, id_col: str = "point_id",
                     lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Label every point with its eps-connectivity cluster: cluster_id
    = the minimum point id transitively reachable through pairs closer
    than eps (so the canonical representative is cluster_id == id;
    singletons label themselves). Output:
    (point_id, cluster_id, cluster_size) — cluster_size counts ALL
    members including singletons' 1."""
    pairs = eps_pairs(points, eps, id_col, lon_col, lat_col).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    labels = dedup_clusters(pairs)
    labeled = (
        points.select(F.col(id_col).alias("point_id"))
        .join(labels.withColumnRenamed("doc_id", "point_id"), "point_id", "left")
        .select(
            "point_id",
            F.coalesce(F.col("cluster_id"), F.col("point_id")).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        "point_id", "cluster_id", "cluster_size"
    )
