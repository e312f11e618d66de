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
from ..geo.wkt import parse_polygon, ring_bbox, ring_centroid

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
    (matches geo.wkt.ring_centroid; sequential summation order)."""
    inner = F.regexp_extract(wkt, r"POLYGON\(\((.*)\)\)", 1)
    pts = F.transform(
        F.split(inner, ","),
        lambda p: F.struct(
            F.split(F.trim(p), " ")[0].cast("double").alias("x"),
            F.split(F.trim(p), " ")[1].cast("double").alias("y"),
        ),
    )
    n = F.size(pts)
    idx = F.sequence(F.lit(1), n - 1)

    def _cross(i):
        a = F.element_at(pts, i)
        b = F.element_at(pts, i + 1)
        return a["x"] * b["y"] - b["x"] * a["y"]

    area2 = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + _cross(i))
    cx = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc
        + (F.element_at(pts, i)["x"] + F.element_at(pts, i + 1)["x"]) * _cross(i),
    ) / (F.lit(3.0) * area2)
    cy = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc
        + (F.element_at(pts, i)["y"] + F.element_at(pts, i + 1)["y"]) * _cross(i),
    ) / (F.lit(3.0) * area2)
    # degenerate ring → vertex mean (same fallback as ring_centroid)
    mean_x = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["x"]) / n
    mean_y = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["y"]) / n
    tiny = F.abs(area2) < F.lit(2e-18)
    return (
        F.when(wkt.startswith("POLYGON"),
               F.when(tiny, mean_x).otherwise(cx)),
        F.when(wkt.startswith("POLYGON"),
               F.when(tiny, mean_y).otherwise(cy)),
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


def assign_tiles(features, lon_col: str = "lon", lat_col: str = "lat"):
    """features(+lon/lat) → + tile cell columns (schema.TILES fields).

    Point features use their coordinates; polygon features use the
    exterior-ring centroid (JVM shoelace expression). Hex cells are
    pure column expressions (whole-stage codegen); only the S2 Hilbert
    interleave crosses to Python — one Arrow pass on two doubles.
    """
    c_lon, c_lat = polygon_centroid_expr(F.col("geometry_wkt"))
    with_pt = features.withColumn(
        "_eff",
        F.struct(
            F.coalesce(F.col(lon_col), c_lon).alias("lon"),
            F.coalesce(F.col(lat_col), c_lat).alias("lat"),
        ),
    )
    out = with_pt
    for res in hexgrid.RESOLUTIONS:
        out = out.withColumn(
            f"h3_r{res}",
            F.when(
                F.col("_eff.lon").isNotNull(),
                hex_cell_expr(F.col("_eff.lon"), F.col("_eff.lat"), res),
            ),
        )
    cells = s2_cells(F.col("_eff.lon"), F.col("_eff.lat"))
    return (
        out.withColumn("_s2", cells)
        .withColumn("s2_cell", F.col("_s2.s2_cell"))
        .withColumn(
            "s2_cover",
            F.when(
                F.col("_s2.s2_cover_joined").isNotNull(),
                F.split(F.col("_s2.s2_cover_joined"), r"\|"),
            ),
        )
        .drop("_s2", "_eff")
    )
