"""Arrow-vectorized spatial column functions (the engine's UDF surface).

Per input_hint, every UDF here is a pandas (Arrow-batched) UDF over
numpy kernels in asag_spark.geo — no row-at-a-time Python. These are
the ONLY Python-side functions in the hot path; everything relational
stays in built-in pyspark.sql.functions (SURVEY.md §2.7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import hexgrid, s2
from ..geo.wkt import parse_polygon, ring_bbox, ring_centroid, rings_centroids

# ---------------------------------------------------------------------------
# JVM-side hex-cell + polygon-centroid expressions (no Python): exact
# column-expression replicas of geo.hexgrid._project/_axial_round and
# geo.wkt.ring_centroid, so the hot path stays in whole-stage codegen.
# F.rint == np.rint (round-half-even) keeps cell ids bit-identical to
# the numpy kernels used driver-side for covers/ring expansion.
# ---------------------------------------------------------------------------

_EARTH_R = 6_371_008.8
_SQRT3_3 = 0.5773502691896257  # sqrt(3)/3


def hex_qr_expr(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    from ..geo.hexgrid import EDGE_M

    s = EDGE_M[res]
    lat_r = F.radians(lat)
    x = F.lit(_EARTH_R) * F.radians(lon) * F.cos(lat_r)
    y = F.lit(_EARTH_R) * lat_r
    qf = (F.lit(_SQRT3_3) * x - y / F.lit(3.0)) / F.lit(s)
    rf = (F.lit(2.0 / 3.0) * y) / F.lit(s)
    # cube rounding (same branch structure as hexgrid._axial_round)
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = F.rint(xf), F.rint(yf), F.rint(zf)
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = (~fix_x) & (dz > dy)
    q = F.when(fix_x, -ry - rz).otherwise(rx).cast("long")
    r = F.when(fix_z, -(F.when(fix_x, -ry - rz).otherwise(rx)) - ry).otherwise(rz).cast("long")
    return q, r


def hex_cell_expr(lon: Column, lat: Column, res: int) -> Column:
    q, r = hex_qr_expr(lon, lat, res)
    return F.concat_ws("_", F.lit(f"h{res}"), q.cast("string"), r.cast("string"))


def polygon_centroid_expr(wkt: Column) -> tuple[Column, Column]:
    """Shoelace centroid of the exterior ring — pure column expressions
    (matches geo.wkt.ring_centroid; sequential summation order).

    Implemented as ONE ``aggregate`` fold with a struct accumulator.
    Spark's higher-order functions are CodegenFallback (interpreted
    eval), and inside an interpreted lambda every ``element_at(pts, i)``
    re-evaluates the whole parse tree — a previous indexed formulation
    re-parsed the ring once per vertex access, O(n²) full-string splits
    per polygon (measured 100×+ the cost of the rest of the tile
    pipeline). The fold parses each vertex exactly once and carries
    (area2, centroid sums, vertex sums, prev vertex) through the
    accumulator: O(n) with identical float summation order.
    """
    inner = F.regexp_extract(wkt, r"POLYGON\(\((.*)\)\)", 1)
    parts = F.split(inner, ",")
    n = F.size(parts)
    zero = F.struct(
        F.lit(0.0).alias("area2"),
        F.lit(0.0).alias("cxa"),
        F.lit(0.0).alias("cya"),
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(None).cast("double").alias("px"),
        F.lit(None).cast("double").alias("py"),
    )

    def _step(a, s):
        sp = F.split(F.trim(s), " ")
        x = sp[0].cast("double")
        y = sp[1].cast("double")
        cross = a["px"] * y - x * a["py"]
        first = a["px"].isNull()
        return F.struct(
            F.when(first, a["area2"]).otherwise(a["area2"] + cross).alias("area2"),
            F.when(first, a["cxa"])
            .otherwise(a["cxa"] + (a["px"] + x) * cross)
            .alias("cxa"),
            F.when(first, a["cya"])
            .otherwise(a["cya"] + (a["py"] + y) * cross)
            .alias("cya"),
            (a["sx"] + x).alias("sx"),
            (a["sy"] + y).alias("sy"),
            x.alias("px"),
            y.alias("py"),
        )

    acc = F.aggregate(parts, zero, _step)
    area2 = acc["area2"]
    tiny = F.abs(area2) < F.lit(2e-18)
    # degenerate ring → vertex mean (same fallback as ring_centroid)
    return (
        F.when(wkt.startswith("POLYGON"),
               F.when(tiny, acc["sx"] / n).otherwise(acc["cxa"] / (F.lit(3.0) * area2))),
        F.when(wkt.startswith("POLYGON"),
               F.when(tiny, acc["sy"] / n).otherwise(acc["cya"] / (F.lit(3.0) * area2))),
    )


_CELLS_SCHEMA = T.StructType(
    [
        T.StructField("h3_r7", T.StringType()),
        T.StructField("h3_r8", T.StringType()),
        T.StructField("h3_r9", T.StringType()),
        T.StructField("h3_r10", T.StringType()),
        T.StructField("s2_cell", T.StringType()),
        T.StructField("s2_cover", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_CELLS_SCHEMA)
def point_cells(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """All tile-index cells for point geometries in one Arrow pass:
    hex cells res 7-10 + S2 level-16 cell + S2 ancestor-cover tokens."""
    import numpy as np

    lon_v = lon.to_numpy(dtype="float64", na_value=float("nan"))
    lat_v = lat.to_numpy(dtype="float64", na_value=float("nan"))
    n = len(lon_v)
    valid = ~(np.isnan(lon_v) | np.isnan(lat_v))
    cols = {k: np.full(n, None, dtype=object)
            for k in ("h3_r7", "h3_r8", "h3_r9", "h3_r10", "s2_cell", "s2_cover")}
    if valid.any():
        lo, la = lon_v[valid], lat_v[valid]
        for res in hexgrid.RESOLUTIONS:
            cols[f"h3_r{res}"][valid] = hexgrid.cell_id(lo, la, res)
        leafs = s2.leaf_cell_id(lo, la)
        cols["s2_cell"][valid] = s2.token(s2.parent_id(leafs, 16))
        covers = s2.cover_point(lo, la)
        idxs = np.flatnonzero(valid)
        for pos, cov in zip(idxs, covers):
            cols["s2_cover"][pos] = cov
    return pd.DataFrame(cols)


@F.pandas_udf(T.StructType([
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("min_lon", T.DoubleType()),
    T.StructField("min_lat", T.DoubleType()),
    T.StructField("max_lon", T.DoubleType()),
    T.StructField("max_lat", T.DoubleType()),
]))
def polygon_anchor(wkt: pd.Series) -> pd.DataFrame:
    """Exterior-ring centroid + bbox for POLYGON WKT (Arrow-batched).
    The centroid is the polygon's representative point for hex/S2
    tile assignment; the bbox feeds cell covers."""
    rows = []
    for w in wkt:
        if w is None or not w.startswith("POLYGON"):
            rows.append((None, None, None, None, None, None))
            continue
        ring = parse_polygon(w)
        cx, cy = ring_centroid(ring)
        b = ring_bbox(ring)
        rows.append((cx, cy, b[0], b[1], b[2], b[3]))
    return pd.DataFrame(
        rows, columns=["lon", "lat", "min_lon", "min_lat", "max_lon", "max_lat"]
    )


def effective_lonlat(geometry_wkt: Column, lon: Column, lat: Column) -> tuple[Column, Column]:
    """Representative point: the point itself, else the polygon
    centroid (computed via polygon_anchor)."""
    anchor = polygon_anchor(geometry_wkt)
    return (
        F.coalesce(lon, anchor["lon"]),
        F.coalesce(lat, anchor["lat"]),
    )


_S2_SCHEMA = T.StructType(
    [
        T.StructField("s2_cell", T.StringType()),
        T.StructField("s2_cover_joined", T.StringType()),
    ]
)


@F.pandas_udf(_S2_SCHEMA)
def s2_cells(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """S2 level-16 cell + '|'-joined ancestor-cover tokens (the only
    Python left in tile assignment — the Hilbert bit interleave).
    Flat strings only across Arrow; the cover splits to array<string>
    JVM-side (list-of-list Arrow transfer measured 3× slower)."""
    import numpy as np

    lon_v = lon.to_numpy(dtype="float64", na_value=float("nan"))
    lat_v = lat.to_numpy(dtype="float64", na_value=float("nan"))
    n = len(lon_v)
    valid = ~(np.isnan(lon_v) | np.isnan(lat_v))
    cell = np.full(n, None, dtype=object)
    cover = np.full(n, None, dtype=object)
    if valid.any():
        leafs = s2.leaf_cell_id(lon_v[valid], lat_v[valid])
        cell[valid] = s2.token(s2.parent_id(leafs, 16))
        cover[valid] = s2.cover_point_joined(leafs)
    return pd.DataFrame({"s2_cell": cell, "s2_cover_joined": cover})


_TC_SCHEMA = T.StructType(
    [
        T.StructField("h3_r7", T.StringType()),
        T.StructField("h3_r8", T.StringType()),
        T.StructField("h3_r9", T.StringType()),
        T.StructField("h3_r10", T.StringType()),
        T.StructField("s2_cell", T.StringType()),
        T.StructField("s2_cover_joined", T.StringType()),
    ]
)


@F.pandas_udf(_TC_SCHEMA)
def _tile_cells(wkt: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """All tile cells in ONE Arrow pass: effective point (the point
    itself, else the bulk-vectorized exterior-ring centroid), hex cells
    res 7-10, S2 level-16 cell + ancestor-cover tokens.

    This is deliberately a pandas UDF rather than column expressions:
    the shoelace fold over WKT vertices needs higher-order functions,
    which are CodegenFallback — interpreted per row, and re-interpreted
    per REFERENCE once coalesce() feeds them into the 8 hex/S2
    consumers (measured 34 µs/polygon × 8 evaluations; this UDF does
    the whole batch in ~2 µs/row). Covers travel as '|'-joined flat
    strings — list-of-list Arrow transfer measured 3× slower.
    """
    import numpy as np

    lon_v = lon.to_numpy(dtype="float64", na_value=float("nan"))
    lat_v = lat.to_numpy(dtype="float64", na_value=float("nan"))
    n = len(lon_v)
    is_poly = (
        wkt.str.startswith("POLYGON").fillna(False).to_numpy(dtype=bool)
        & np.isnan(lon_v)
    )
    if is_poly.any():
        cx, cy = rings_centroids(wkt[is_poly].tolist())
        lon_v = lon_v.copy()
        lat_v = lat_v.copy()
        lon_v[is_poly] = cx
        lat_v[is_poly] = cy
    valid = ~(np.isnan(lon_v) | np.isnan(lat_v))
    cols = {
        k: np.full(n, None, dtype=object)
        for k in ("h3_r7", "h3_r8", "h3_r9", "h3_r10", "s2_cell", "s2_cover_joined")
    }
    if valid.any():
        lo, la = lon_v[valid], lat_v[valid]
        for res in hexgrid.RESOLUTIONS:
            cols[f"h3_r{res}"][valid] = hexgrid.cell_id(lo, la, res)
        leafs = s2.leaf_cell_id(lo, la)
        cols["s2_cell"][valid] = s2.token(s2.parent_id(leafs, 16))
        cols["s2_cover_joined"][valid] = s2.cover_point_joined(leafs)
    return pd.DataFrame(cols)


def assign_tiles(features, lon_col: str = "lon", lat_col: str = "lat"):
    """features(+lon/lat) → + tile cell columns (schema.TILES fields).

    Point features use their coordinates; polygon features use the
    exterior-ring centroid. Everything runs in the single Arrow pass of
    ``_tile_cells`` (see its docstring for why this beats JVM column
    expressions here); the UDF result is one physical column, so the
    per-cell projections below are free field reads."""
    cells = _tile_cells(F.col("geometry_wkt"), F.col(lon_col), F.col(lat_col))
    out = features.withColumn("_tc", cells)
    for res in hexgrid.RESOLUTIONS:
        out = out.withColumn(f"h3_r{res}", F.col(f"_tc.h3_r{res}"))
    return (
        out.withColumn("s2_cell", F.col("_tc.s2_cell"))
        .withColumn(
            "s2_cover",
            F.when(
                F.col("_tc.s2_cover_joined").isNotNull(),
                F.split(F.col("_tc.s2_cover_joined"), r"\|"),
            ),
        )
        .drop("_tc")
    )
