"""Spatial column functions — JVM expressions where possible, one thin
Arrow UDF where not.

Division of labor (bandwidth-first — see BENCH/BASELINE.md hardware
probes: this class of host caps memory bandwidth per guest, so every
byte shipped JVM→Python→JVM costs scaling):

* Hex-cell assignment (H3-style res 7-10) is pure arithmetic on
  (lon, lat) — axial projection + cube rounding — expressed entirely in
  codegen'd ``pyspark.sql.functions`` (`hex_cell`). Constants reuse
  asag_spark.geo.hexgrid so the JVM lattice and the numpy lattice
  (used by PIP cover / kNN ring candidates) agree.
* S2 cell ids need the 8-round Hilbert table walk — that stays numpy,
  but the ``_geo_kernel`` pandas UDF ships only (mostly-null
  polygon WKT, lon, lat) in and (mostly-null centroid, one int64 leaf
  id) out — ~24 B/row each way instead of the previous multi-string
  transfer. Tokens and ancestor covers are then pure bit/hex ops on
  the leaf id, done JVM-side (`s2_token_of`): S2 parent = mask+set-lsb,
  token = zero-padded hex with trailing zeros stripped — two's
  complement int64 carries the uint64 bit pattern losslessly.
* Polygon centroids (the only other Python need — bulk shoelace over
  WKT rings) ride in the same UDF, computed only for the polygon rows
  (the input column is NULL for points, so the Arrow buffer is a
  validity bitmap + the few real strings).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from ..geo import hexgrid, s2
from ..geo.wkt import rings_centroids

_DEG2RAD = math.pi / 180.0  # numpy deg2rad multiplies by this constant
_SQRT3_3 = hexgrid._SQRT3 / 3.0


def hex_cell(lon: Column, lat: Column, res: int) -> Column:
    """`h{res}_{q}_{r}` hex cell id — JVM replica of hexgrid.cell_qr
    (same constants, same operation order, HALF_EVEN rounding =
    np.rint) so ids join exactly against the numpy-generated PIP
    covers / kNN rings. Null lon/lat → null id (concat null
    propagation)."""
    s = float(hexgrid.EDGE_M[res])
    lat_r = lat * _DEG2RAD
    x = F.lit(hexgrid.EARTH_RADIUS_M) * (lon * _DEG2RAD) * F.cos(lat_r)
    y = F.lit(hexgrid.EARTH_RADIUS_M) * lat_r
    qf = (F.lit(_SQRT3_3) * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    # cube rounding (hexgrid._axial_round): yf = -qf-rf; round all three
    # half-even; push the largest rounding error back onto its axis
    yf = -qf - rf
    rx = F.bround(qf)
    ry = F.bround(yf)
    rz = F.bround(rf)
    dx = F.abs(rx - qf)
    dy = F.abs(ry - yf)
    dz = F.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    q = F.when(fix_x, -ry - rz).otherwise(rx)
    fix_z = ~fix_x & (dz > dy)
    r = F.when(fix_z, -q - ry).otherwise(rz)
    return F.concat(
        F.lit(f"h{res}_"),
        q.cast("long").cast("string"),
        F.lit("_"),
        r.cast("long").cast("string"),
    )


def s2_token_of(leaf: Column, level: int) -> Column:
    """S2 hex token of the ``level`` ancestor of an int64-carried leaf
    cell id — JVM replica of s2.parent_id + s2.token (mask to the
    level, set the level's lsb, 16-digit lower hex, strip trailing
    zeros). Two's-complement bit ops equal uint64 bit ops, and
    hex(bigint) emits the two's-complement pattern.

    The strip is a plan-time-constant substring, not a regex: the
    parent's lowest set bit is exactly the lsb we OR in at bit
    2·(30−level), bits below it are masked to zero, so the token
    always has 16 − (2·(30−level))//4 hex digits and its last digit
    (the nibble holding the lsb) is nonzero — the 'X' (empty-token)
    case is unreachable for a leaf-derived parent."""
    shift = 2 * (s2.MAX_LEVEL - level)
    lsb = 1 << shift
    parent = leaf.bitwiseAND(F.lit(~(lsb - 1))).bitwiseOR(F.lit(lsb))
    return F.substring(
        F.lpad(F.lower(F.hex(parent)), 16, "0"), 1, 16 - shift // 4
    )


_GK_SCHEMA = T.StructType(
    [
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("s2_leaf", T.LongType()),
    ]
)


@F.pandas_udf(_GK_SCHEMA)
def _geo_kernel(poly_wkt: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """One thin Arrow pass: exterior-ring centroids for the (few)
    polygon rows + the S2 Hilbert leaf id for every valid point.
    ``poly_wkt`` is pre-masked JVM-side to be null for point rows."""
    import numpy as np

    lon_v = lon.to_numpy(dtype="float64", na_value=float("nan"))
    lat_v = lat.to_numpy(dtype="float64", na_value=float("nan"))
    n = len(lon_v)
    cx = np.full(n, np.nan)
    cy = np.full(n, np.nan)
    is_poly = poly_wkt.notna().to_numpy(dtype=bool)
    if is_poly.any():
        px, py = rings_centroids(poly_wkt[is_poly].tolist())
        cx[is_poly] = px
        cy[is_poly] = py
    eff_lon = np.where(is_poly, cx, lon_v)
    eff_lat = np.where(is_poly, cy, lat_v)
    valid = ~(np.isnan(eff_lon) | np.isnan(eff_lat))
    leaf = pd.array(np.zeros(n, dtype=np.int64), dtype="Int64")
    leaf[~valid] = pd.NA
    if valid.any():
        # uint64 leaf ids ride as two's-complement int64 (face>=4 sets
        # the sign bit; JVM bit ops are bit-pattern-identical)
        leaf[valid] = s2.leaf_cell_id(
            eff_lon[valid], eff_lat[valid]
        ).view(np.int64)
    return pd.DataFrame(
        {
            "cx": np.where(is_poly, cx, np.nan),
            "cy": np.where(is_poly, cy, np.nan),
            "s2_leaf": leaf,
        }
    )


def assign_tiles(features, lon_col: str = "lon", lat_col: str = "lat"):
    """features(+lon/lat) → + tile cell columns (schema.TILES fields).

    Point features use their coordinates; polygon features use the
    exterior-ring centroid (computed in the thin Arrow kernel). Hex
    cells and S2 tokens/covers are JVM expressions over the effective
    coordinates / leaf id — the UDF result is one physical column, so
    every projection below is a field read."""
    poly_only_wkt = F.when(
        F.col("geometry_wkt").startswith("POLYGON") & F.col(lon_col).isNull(),
        F.col("geometry_wkt"),
    )
    gk = _geo_kernel(poly_only_wkt, F.col(lon_col), F.col(lat_col))
    out = features.withColumn("_gk", gk)
    eff_lon = F.coalesce(F.col("_gk.cx"), F.col(lon_col))
    eff_lat = F.coalesce(F.col("_gk.cy"), F.col(lat_col))
    leaf = F.col("_gk.s2_leaf")
    for res in hexgrid.RESOLUTIONS:
        out = out.withColumn(f"h3_r{res}", hex_cell(eff_lon, eff_lat, res))
    return (
        out.withColumn("s2_cell", s2_token_of(leaf, 16))
        .withColumn(
            "s2_cover",
            F.when(
                leaf.isNotNull(),
                F.array(
                    *[s2_token_of(leaf, lv) for lv in s2.COVER_LEVELS]
                ),
            ),
        )
        .drop("_gk")
    )
