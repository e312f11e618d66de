"""Arrow-vectorized spatial column functions (the engine's UDF surface).

Per input_hint, every UDF here is an Arrow-batched pandas UDF over
numpy kernels in asag_spark.geo — no row-at-a-time Python. These are
the ONLY Python-side functions in the tile-assignment path; everything
relational stays in built-in pyspark.sql.functions (SURVEY.md §2.7).

Why a UDF and not JVM column expressions for the geometry math: the
shoelace centroid over WKT vertices needs Spark higher-order functions,
which are CodegenFallback — interpreted per row — and Catalyst inlines
a multi-referenced alias into each consumer, so a JVM formulation
re-evaluated the centroid fold once per hex/S2 column (~8×; measured
34 µs/polygon/evaluation vs ~2 µs/row total for this UDF's whole
batch). The hex lattice + S2 Hilbert math is pure numpy over two
double arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import hexgrid, s2
from ..geo.wkt import rings_centroids

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
    res 7-10, S2 level-16 cell + ancestor-cover tokens. Covers travel
    as '|'-joined flat strings — list-of-list Arrow transfer measured
    3× slower."""
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
    ``_tile_cells``; the UDF result is one physical column, so the
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
