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

from pyspark.sql import DataFrame, Window
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
    return _with_sizes(labeled)


def _with_sizes(labeled: DataFrame) -> DataFrame:
    """Attach cluster_size with ONE shuffle: a count window over
    cluster_id instead of a groupBy + self-join (which would both
    recompute the labeling lineage twice and shuffle twice)."""
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        "point_id", "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def _local_union_find(pdf, eps: float):
    """Driver/executor-side exact single-linkage over one block's
    points (home + halo): eps-cell binning for candidate pairs (the
    same 3x3 pattern as eps_pairs, in numpy), union-find with path
    compression, label = min point id in the local component."""
    import numpy as np
    import pandas as pd

    ids = pdf["point_id"].to_numpy()
    xs = pdf["lon"].to_numpy()
    ys = pdf["lat"].to_numpy()
    n = len(ids)
    parent = np.arange(n)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    cells: dict = {}
    cxs = np.floor(xs / eps).astype(np.int64)
    cys = np.floor(ys / eps).astype(np.int64)
    for i in range(n):
        cells.setdefault((cxs[i], cys[i]), []).append(i)
    eps2 = eps * eps
    for (cx, cy), members in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                other = cells.get((cx + dx, cy + dy))
                if other is None:
                    continue
                for i in members:
                    for j in other:
                        if i < j and (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2 <= eps2:
                            ri, rj = find(i), find(j)
                            if ri != rj:
                                parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    # label = min point id per component (order-invariant)
    lab = pd.Series(ids).groupby(roots).transform("min").to_numpy()
    return pd.DataFrame({"point_id": ids, "label": lab})


def spatial_clusters_partitioned(points: DataFrame, eps: float,
                                 block_cells: int = 64,
                                 id_col: str = "point_id",
                                 lon_col: str = "lon",
                                 lat_col: str = "lat") -> DataFrame:
    """Two-level exact eps-connectivity clustering — the web-scale plan
    (same output contract as spatial_clusters, parity-tested).

    spatial_clusters runs GLOBAL min-label propagation: 2 shuffles + a
    driver count per round over the whole pair graph, O(component
    diameter) rounds. Exact, but at 10^9+ points every round touches
    every edge. This variant exploits that single-linkage is LOCAL
    except at partition boundaries (the partition-then-merge shape of
    MR-DBSCAN, He et al. 2011):

      1. bin points to square blocks of pitch block_cells*eps and
         replicate each point to every block whose eps-expanded extent
         contains it (<= 4 blocks, and only for points within eps of a
         boundary — replication factor ~ 1 + 4/block_cells);
      2. per block, ONE Arrow stage runs the exact in-memory
         union-find (eps-cell binning, the same 3x3 candidate pattern)
         — every eps-pair is witnessed in at least one block because
         the halo is exactly eps;
      3. a point replicated to k blocks carries k local labels; those
         label-label identities are the ONLY global edges. The
         iterative closure (dedup_clusters, unchanged) runs on that
         boundary-label graph — O(boundary points), a vanishing
         fraction of the corpus — and interior points never enter a
         propagation round at all.

    Exactness: a local label is the min point id of a block-local
    component; global components are unions of local components glued
    by shared (replicated) points, which is precisely the label graph
    closed in step 3; the global min point id is its own local min, so
    the final cluster_id convention (min reachable point id) is
    preserved. block_cells dials skew: a hot block (a metro inside one
    block) is one Arrow task — shrink block_cells to split it, the
    halo cost rises as 4/block_cells."""
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if block_cells < 2:
        raise ValueError(f"block_cells must be >= 2, got {block_cells}")
    B = float(eps) * block_cells
    e = float(eps)
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    lo_x = F.floor((F.col("lon") - e) / B).cast("long")
    hi_x = F.floor((F.col("lon") + e) / B).cast("long")
    lo_y = F.floor((F.col("lat") - e) / B).cast("long")
    hi_y = F.floor((F.col("lat") + e) / B).cast("long")
    # a point lands in 1, 2, or 4 blocks (eps < B/2 guaranteed above);
    # array_distinct collapses the duplicates for interior points
    blocks = F.array_distinct(F.array(*[
        F.struct(bx.alias("bx"), by.alias("by"))
        for bx in (lo_x, hi_x) for by in (lo_y, hi_y)
    ]))
    rep = pts.select(
        "point_id", "lon", "lat", F.explode(blocks).alias("_b")
    ).select("point_id", "lon", "lat",
             F.col("_b.bx").alias("bx"), F.col("_b.by").alias("by"))

    def _cc(pdf):
        return _local_union_find(pdf, e)

    local = rep.groupBy("bx", "by").applyInPandas(
        _cc, "point_id long, label long"
    )
    # per_point feeds BOTH the merge-edge extraction and the final
    # relabel join — persist it so the Arrow local-CC stage runs once,
    # then cut the returned plan loose with a localCheckpoint before
    # unpersisting (same lifecycle idiom as dedup_clusters' edge cache)
    per_point = local.groupBy("point_id").agg(
        F.min("label").alias("_l0"),
        F.collect_set("label").alias("_ls"),
    ).persist()
    try:
        merge_edges = (
            per_point.filter(F.size("_ls") > 1)
            .select(F.col("_l0").alias("doc_a"), F.explode("_ls").alias("doc_b"))
            .filter(F.col("doc_a") != F.col("doc_b"))
        )
        roots = dedup_clusters(merge_edges).withColumnRenamed("doc_id", "_l0")
        labeled = (
            per_point.join(roots, "_l0", "left")
            .select(
                "point_id",
                F.coalesce(F.col("cluster_id"), F.col("_l0")).alias("cluster_id"),
            )
            .localCheckpoint()
        )
    finally:
        per_point.unpersist()
    return _with_sizes(labeled)
