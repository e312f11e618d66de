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


def assign_tiles(features, lon_col: str = "lon", lat_col: str = "lat"):
    """features(+lon/lat) → + tile cell columns (schema.TILES fields).

    Point features use their coordinates; polygon features use the
    exterior-ring centroid. One Arrow round-trip total.
    """
    anchor = polygon_anchor(F.col("geometry_wkt"))
    with_pt = features.withColumn(
        "_eff",
        F.struct(
            F.coalesce(F.col(lon_col), anchor["lon"]).alias("lon"),
            F.coalesce(F.col(lat_col), anchor["lat"]).alias("lat"),
        ),
    )
    cells = point_cells(F.col("_eff.lon"), F.col("_eff.lat"))
    return (
        with_pt.withColumn("_cells", cells)
        .withColumn("h3_r7", F.col("_cells.h3_r7"))
        .withColumn("h3_r8", F.col("_cells.h3_r8"))
        .withColumn("h3_r9", F.col("_cells.h3_r9"))
        .withColumn("h3_r10", F.col("_cells.h3_r10"))
        .withColumn("s2_cell", F.col("_cells.s2_cell"))
        .withColumn("s2_cover", F.col("_cells.s2_cover"))
        .drop("_cells", "_eff")
    )
