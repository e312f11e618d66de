"""Point-in-polygon join (SURVEY.md §2.3, the operator the north_rule
adds beyond the reference).

Strategy (100 TB-ready):

1. The polygon side (tariff zones / municipalities) is SMALL relative
   to the point side — registry-scale, like the reference's zone set.
   Its exterior rings are parsed once and broadcast to every executor
   (the "broadcast R-tree side" of BASELINE.json; here a dict keyed by
   hex cell instead of an STRtree — same role: O(1) candidate lookup).
2. Candidate pruning is a CELL PRE-JOIN: each zone is expanded to the
   res-7 hex cells covering its bbox (cover_bbox), each point gets its
   res-7 cell — a broadcast equi-join on the cell id. The big point
   side never shuffles.
3. Exact refine: even-odd ray cast (geo.wkt.points_in_ring) inside an
   Arrow-batched pandas UDF, vectorized across the batch per zone.

Skew: dense urban cells only inflate the candidate row count of those
cells' points; the join stays broadcast so no shuffle hotspot exists.
A salt column is unnecessary here — there is no shuffle to skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import hexgrid
from ..geo.wkt import parse_polygon, points_in_ring, ring_bbox

PIP_RES = 7
PIP_SALT = 16


def _zone_index(zones_rows: list) -> tuple[dict, dict]:
    """rings[zone_id] = (N,2) ring; cover[cell_qr] = [zone_id, ...].

    Dirty-input guard: duplicate zone_id rows keep the max geom_wkt —
    the same rule pip_join_partitioned applies — so both PIP variants
    agree (and no zone appears twice in a cell's cover list, which
    would duplicate output rows)."""
    best: dict[str, str] = {}
    for row in zones_rows:
        zid, wkt = row["zone_id"], row["geom_wkt"]
        if zid not in best or wkt > best[zid]:
            best[zid] = wkt
    rings: dict[str, np.ndarray] = {}
    cover: dict[tuple[int, int], list[str]] = {}
    for zid in best:
        ring = parse_polygon(best[zid])
        rings[zid] = ring
        bb = ring_bbox(ring)
        for qr in hexgrid.cover_bbox(*bb, res=PIP_RES):
            cover.setdefault(qr, []).append(zid)
    return rings, cover


def zone_covers(zones: DataFrame, res: int = PIP_RES) -> DataFrame:
    """Explode each zone polygon to its covering hex cells at ``res``
    (bbox cover + pad ring — the candidate-generation primitive; exact
    refinement always follows with the ray cast). Arrow-batched.

    Output: (zone_id, cell) — deterministic pure function of the ring.
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("zone_id", T.StringType()),
            T.StructField("cell", T.StringType()),
        ]
    )

    def expand(batches):
        for pdf in batches:
            zids, cells = [], []
            for zid, wkt in zip(pdf["zone_id"], pdf["geom_wkt"]):
                ring = parse_polygon(wkt)
                for q, r in hexgrid.cover_bbox(*ring_bbox(ring), res=res):
                    zids.append(zid)
                    cells.append(f"h{res}_{q}_{r}")
            yield pd.DataFrame({"zone_id": zids, "cell": cells})

    return zones.select("zone_id", "geom_wkt").mapInPandas(expand, schema=schema)


def _batch_candidates(lon: np.ndarray, lat: np.ndarray,
                      cover: dict) -> dict[str, np.ndarray]:
    """zone_id → indices of batch points whose res-7 cell is in that
    zone's cover — the shared candidate-generation step of the PIP
    kernels. Lookup per UNIQUE cell, not per point: points cluster
    (Zipf urban skew), so unique cells << points and the Python loop
    cost is O(cells), with numpy carrying the per-point work
    (sort + slice; the ray cast follows in the caller)."""
    q, r = hexgrid.cell_qr(lon, lat, PIP_RES)
    key = (q.astype(np.int64) << 32) ^ (r.astype(np.int64) & 0xFFFFFFFF)
    uniq, rep, inv = np.unique(key, return_index=True, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    zone_to_pts: dict[str, list[np.ndarray]] = {}
    for ci in range(len(uniq)):
        zids = cover.get((int(q[rep[ci]]), int(r[rep[ci]])), ())
        if not zids:
            continue
        pts = order[bounds[ci]:bounds[ci + 1]]
        for zid in zids:
            zone_to_pts.setdefault(zid, []).append(pts)
    return {
        zid: (parts[0] if len(parts) == 1 else np.concatenate(parts))
        for zid, parts in zone_to_pts.items()
    }


def pip_join(points: DataFrame, zones: DataFrame,
             id_col: str = "feature_id",
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """(point id, zone_id) pairs for every point inside a zone polygon.

    ``points``: any frame with id/lon/lat. ``zones``: schema.ZONES.
    Output columns: (<id_col>, zone_id) — matching pip_golden
    (FIXTURES.md §4).
    """
    spark = points.sparkSession
    rings, cover = _zone_index(zones.collect())
    bc = spark.sparkContext.broadcast((rings, cover))

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("zone_id", T.StringType()),
        ]
    )

    def refine(batches):
        rings_l, cover_l = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype="float64", na_value=np.nan)
            lat = pdf[lat_col].to_numpy(dtype="float64", na_value=np.nan)
            ids = pdf[id_col].to_numpy(dtype=object)
            ok = ~(np.isnan(lon) | np.isnan(lat))
            if not ok.any():
                yield pd.DataFrame({id_col: [], "zone_id": []})
                continue
            lon, lat, ids = lon[ok], lat[ok], ids[ok]
            out_ids, out_zones = [], []
            for zid, pis_a in _batch_candidates(lon, lat, cover_l).items():
                inside = points_in_ring(lon[pis_a], lat[pis_a], rings_l[zid])
                hit = pis_a[inside]
                out_ids.extend(ids[hit])
                out_zones.extend([zid] * len(hit))
            yield pd.DataFrame({id_col: out_ids, "zone_id": out_zones})

    return points.select(id_col, lon_col, lat_col).mapInPandas(
        refine, schema=out_schema
    )


def pip_join_partitioned(points: DataFrame, zones: DataFrame,
                         id_col: str = "feature_id",
                         lon_col: str = "lon",
                         lat_col: str = "lat") -> DataFrame:
    """Broadcast-free PIP join — the plan for when the polygon side
    outgrows a broadcast (continent-scale cadastral tables, SCALE.md
    §4). Output rows are IDENTICAL to ``pip_join``; only the physical
    plan differs.

    Shape:
    1. candidates: points get their res-7 cell as a codegen'd JVM
       expression (`functions.hex_cell` — same lattice as the numpy
       covers) and shuffle-join `zone_covers` on the cell id. Both
       sides exchange narrow rows only; dense-cell skew lands on a
       JOIN exchange, which AQE skew-split handles.
    2+3. geometry attach + exact refine in ONE salted cogroup:
       candidates and (salt-replicated) zone rows both key by
       (zone_id, salt) and meet in applyInPandas — each ring crosses
       the wire and the Arrow boundary once per group, never once per
       candidate, and the salt splits a hot zone's candidates across
       PIP_SALT groups so no polygon pins a single task. The ray cast
       runs vectorized over each group.

    Broadcast `pip_join` stays the default: its point side never
    shuffles at all. This variant trades two narrow exchanges for
    dropping the requirement that the zone index fit on every
    executor."""
    from ..functions import hex_cell

    # dirty-input guard: duplicate zone_id rows would double candidates
    # via duplicated covers and make refine's ring pick arbitrary —
    # keep one row per zone_id (max geom_wkt: deterministic, and
    # matches nothing when zones are clean, the normal case)
    zones = zones.groupBy("zone_id").agg(F.max("geom_wkt").alias("geom_wkt"))
    pts = points.select(
        F.col(id_col), F.col(lon_col).alias("_lon"), F.col(lat_col).alias("_lat")
    ).filter(F.col("_lon").isNotNull() & F.col("_lat").isNotNull())
    cand = (
        pts.withColumn("cell", hex_cell(F.col("_lon"), F.col("_lat"), PIP_RES))
        .join(zone_covers(zones, res=PIP_RES).hint("shuffle_hash"), "cell")
        # cast to int to EXACTLY match the zone side's salt type:
        # cogroup with type-mismatched keys (bigint pmod vs int
        # literal) does NOT unify them before the exchange — each side
        # hashes its own representation, the same logical key lands in
        # different partitions per side, and ~90% of groups silently
        # arrive with one side empty (measured: 1,536 invocations for
        # 800 true keys, 1.19M of 1.31M candidates lost)
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(PIP_SALT)).cast("int"),
        )
        .select(id_col, "_lon", "_lat", "zone_id", "_salt")
    )
    # geometry rides the cogroup's RIGHT side: one ring per (zone, salt)
    # group instead of one per candidate row — attaching the WKT with a
    # plain join duplicated each ring into every candidate crossing the
    # JVM→Arrow boundary (~ring-size× the necessary transfer; measured
    # ~1.4 GB at the 931k-candidate bench). The salt splits a hot
    # zone's candidates across PIP_SALT groups so a metro-covering
    # polygon cannot pin one task; its cost is PIP_SALT copies of each
    # ring, which is negligible.
    zsalt = zones.select("zone_id", "geom_wkt").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(PIP_SALT)]))
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("zone_id", T.StringType()),
        ]
    )

    def refine(key, cand_pdf, zone_pdf):
        if not len(cand_pdf) or not len(zone_pdf):
            return pd.DataFrame({id_col: [], "zone_id": []})
        ring = parse_polygon(zone_pdf["geom_wkt"].iloc[0])
        lon = cand_pdf["_lon"].to_numpy(dtype="float64")
        lat = cand_pdf["_lat"].to_numpy(dtype="float64")
        inside = points_in_ring(lon, lat, ring)
        return pd.DataFrame(
            {
                id_col: cand_pdf[id_col].to_numpy(dtype=object)[inside],
                "zone_id": key[0],
            }
        )

    return (
        cand.groupBy("zone_id", "_salt")
        .cogroup(zsalt.groupBy("zone_id", "_salt"))
        .applyInPandas(refine, schema=out_schema)
    )


def pip_anti_join(points: DataFrame, zones: DataFrame,
                  id_col: str = "feature_id",
                  lon_col: str = "lon", lat_col: str = "lat",
                  with_coords: bool = False) -> DataFrame:
    """Spatial ANTI-join: ids of points inside NO zone polygon — the
    coverage-gap audit every zone-assignment pipeline needs (stops the
    tariff map forgot, docs outside every municipality). Complements
    pip_join the way LEFT ANTI complements INNER.

    Plan shape (100 TB): PIP membership is a PER-POINT predicate, so
    the anti set needs no join at all — the same broadcast cell-index
    + vectorized ray cast as ``pip_join``, output inverted per Arrow
    batch in ONE mapInPandas pass over the point side. A naive
    ``points LEFT ANTI JOIN pip_join(...)`` would scan the points
    twice and shuffle both sides on the id; this emits identical rows
    with zero exchange. Short-circuit: each zone ray-casts only the
    batch points not already covered by an earlier zone, so overlap-
    heavy zone sets do strictly less work than the positive variant.

    Null-coordinate points follow pip_join's contract (the caller
    filters them; they are neither covered nor reported).
    Output: (<id_col>) — one row per uncovered point; with
    ``with_coords`` also (<lon_col>, <lat_col>), so a downstream
    fallback (e.g. knn.snap_nearest_zone) needs no join back to the
    big point table.
    """
    spark = points.sparkSession
    rings, cover = _zone_index(zones.collect())
    bc = spark.sparkContext.broadcast((rings, cover))
    fields = [T.StructField(id_col, T.StringType())]
    if with_coords:
        fields += [T.StructField(lon_col, T.DoubleType()),
                   T.StructField(lat_col, T.DoubleType())]
    out_schema = T.StructType(fields)

    def refine(batches):
        rings_l, cover_l = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype="float64", na_value=np.nan)
            lat = pdf[lat_col].to_numpy(dtype="float64", na_value=np.nan)
            ids = pdf[id_col].to_numpy(dtype=object)
            ok = ~(np.isnan(lon) | np.isnan(lat))
            if not ok.any():
                yield pd.DataFrame({c.name: [] for c in fields})
                continue
            lon, lat, ids = lon[ok], lat[ok], ids[ok]
            covered = np.zeros(len(ids), dtype=bool)
            for zid, pis_a in _batch_candidates(lon, lat, cover_l).items():
                pis_a = pis_a[~covered[pis_a]]
                if not len(pis_a):
                    continue
                inside = points_in_ring(lon[pis_a], lat[pis_a], rings_l[zid])
                covered[pis_a[inside]] = True
            out = {id_col: ids[~covered]}
            if with_coords:
                out[lon_col] = lon[~covered]
                out[lat_col] = lat[~covered]
            yield pd.DataFrame(out)

    return points.select(id_col, lon_col, lat_col).mapInPandas(
        refine, schema=out_schema
    )


def pip_flag_join(points: DataFrame, zones: DataFrame,
                  lon_col: str = "lon", lat_col: str = "lat",
                  flag_col: str = "covered") -> DataFrame:
    """Append a boolean ``covered`` column (inside ANY zone) while
    keeping EVERY input column — the generic form of pip_join /
    pip_anti_join for pipelines that need the membership bit alongside
    other data (e.g. the streaming coverage-gap monitor, which windows
    uncovered points by event time: the positive/anti variants drop
    the timestamp). Same zero-exchange broadcast kernel; STATELESS, so
    it runs unchanged on a Structured Streaming frame (mapInPandas is
    streaming-capable; watermarks/windows attach downstream).

    Null coordinates yield ``covered = false`` here — rows survive (a
    monitor must see them), unlike pip_join/pip_anti_join's
    filter-first contract where they vanish from both sides.
    """
    spark = points.sparkSession
    rings, cover = _zone_index(zones.collect())
    bc = spark.sparkContext.broadcast((rings, cover))
    out_schema = T.StructType(
        list(points.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )

    def refine(batches):
        rings_l, cover_l = bc.value
        for pdf in batches:
            covered_full = np.zeros(len(pdf), dtype=bool)
            lon = pdf[lon_col].to_numpy(dtype="float64", na_value=np.nan)
            lat = pdf[lat_col].to_numpy(dtype="float64", na_value=np.nan)
            ok = ~(np.isnan(lon) | np.isnan(lat))
            if ok.any():
                idx = np.nonzero(ok)[0]
                lon_o, lat_o = lon[ok], lat[ok]
                covered = np.zeros(len(idx), dtype=bool)
                for zid, pis in _batch_candidates(lon_o, lat_o, cover_l).items():
                    pis = pis[~covered[pis]]
                    if not len(pis):
                        continue
                    inside = points_in_ring(lon_o[pis], lat_o[pis], rings_l[zid])
                    covered[pis[inside]] = True
                covered_full[idx] = covered
            out = pdf.copy()
            out[flag_col] = covered_full
            yield out

    return points.mapInPandas(refine, schema=out_schema)


def snap_to_boundary(points: DataFrame, zones: DataFrame,
                     id_col: str = "feature_id",
                     lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Nearest-boundary-edge snap (the map-matching primitive): for
    every point, the closest point ON any zone's exterior-ring edge —
    projection onto the segment, clamped to its endpoints — plus the
    owning zone/edge and the great-circle snap distance.

    Geometry: the projection parameter t = clamp(((p−a)·(b−a)) /
    |b−a|², 0, 1) is computed in lon/lat degree space with latitude
    scaled by cos(mean ring latitude) (the standard local equirect
    correction — without it, east-west distances near 59°N are
    overweighted ~2×); distances for the argmin and the reported
    dist_m are haversine meters to the candidate snap point, so the
    winner is chosen by true metric distance among the per-edge
    projections. Ties break (zone_id ASC, edge_idx ASC).

    Scale shape (mirrors pip_join's broadcast side): zone edges are
    registry-scale — parsed once driver-side and broadcast as dense
    numpy arrays; the point side is a single Arrow mapInPandas pass
    with an (n_batch × n_edges) vectorized distance computation and
    NO shuffle at all (no join, no window — the argmin is per-row).
    Dense urban skew is irrelevant: per-point cost is uniform. With a
    non-registry-scale edge set, the same kernel runs behind a
    cell-pre-join prune exactly like pip_join_partitioned.

    Output: (feature_id, zone_id, edge_idx, snap_lon, snap_lat,
    dist_m) — snap coords rounded to 7 dp, dist_m to 3 dp.
    """
    spark = points.sparkSession
    zrows = zones.select("zone_id", "geom_wkt").collect()
    rings, _ = _zone_index(zrows)
    if not rings:
        raise ValueError("snap_to_boundary: no zones")
    zids, eidx, A, B = [], [], [], []
    for zid in sorted(rings):
        ring = rings[zid]
        # exterior ring is closed (first == last vertex): edges i -> i+1
        for i in range(len(ring) - 1):
            zids.append(zid)
            eidx.append(i)
            A.append(ring[i])
            B.append(ring[i + 1])
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    zid_arr = np.asarray(zids)
    eidx_arr = np.asarray(eidx, dtype=np.int32)
    coslat = np.cos(np.radians((A[:, 1] + B[:, 1]) / 2.0))
    bc = spark.sparkContext.broadcast((zid_arr, eidx_arr, A, B, coslat))

    id_type = points.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("feature_id", id_type),
            T.StructField("zone_id", T.StringType()),
            T.StructField("edge_idx", T.IntegerType()),
            T.StructField("snap_lon", T.DoubleType()),
            T.StructField("snap_lat", T.DoubleType()),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )

    def snap(batches):
        from ..geo.wkt import haversine_m

        zid_v, eidx_v, A_v, B_v, cl = bc.value
        ab = B_v - A_v                               # (E, 2)
        # scaled-degree squared edge lengths for the projection param
        ab_sc = ab.copy()
        ab_sc[:, 0] *= cl
        denom = (ab_sc * ab_sc).sum(axis=1)
        denom[denom == 0.0] = 1.0                    # degenerate edge -> t=0
        # chunk so the (n_chunk x E) intermediates stay ~tens of MB
        # regardless of the edge-set size
        chunk = max(1, 2_000_000 // max(1, len(A_v)))

        def snap_chunk(pdf):
            P = np.stack(
                [pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy()], axis=1
            )
            ap = P[:, None, :] - A_v[None, :, :]     # (n, E, 2)
            ap_sc = ap.copy()
            ap_sc[..., 0] *= cl[None, :]
            t = np.clip((ap_sc * ab_sc[None, :, :]).sum(-1) / denom[None, :],
                        0.0, 1.0)                    # (n, E)
            proj = A_v[None, :, :] + t[..., None] * ab[None, :, :]
            # (n,1) columns broadcast against (n,E) inside haversine —
            # materializing them with np.repeat doubled the kernel's
            # memory traffic and showed up as 2-3x wall at 1M points
            d = haversine_m(
                P[:, 0:1], P[:, 1:2], proj[..., 0], proj[..., 1]
            )
            best = d.argmin(axis=1)                  # edges sorted (zone, idx):
            rows = np.arange(len(P))                 # argmin first-min = tie rule
            return pd.DataFrame(
                {
                    "feature_id": pdf[id_col],
                    "zone_id": zid_v[best],
                    "edge_idx": eidx_v[best],
                    "snap_lon": np.round(proj[rows, best, 0], 7),
                    "snap_lat": np.round(proj[rows, best, 1], 7),
                    "dist_m": np.round(d[rows, best], 3),
                }
            )

        for pdf0 in batches:
            for lo in range(0, len(pdf0), chunk):
                pdf = pdf0.iloc[lo:lo + chunk]
                if len(pdf):
                    yield snap_chunk(pdf)

    return points.select(id_col, lon_col, lat_col).mapInPandas(
        snap, schema=out_schema
    )
