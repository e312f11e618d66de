"""Web-Mercator z/x/y (slippy) tiling + quadkeys — pure JVM expressions.

The reference publishes its FeatureCollection as a Mapbox tileset
(`MapBoxUpdateRouteBuilder.java:109-122` initiates the upload; Mapbox
then slices the upload into Web-Mercator z/x/y vector tiles
server-side).  At web scale the slicing must be an engine operator: a
100 TB feature table cannot round-trip through an upload service, so
the z/x/y assignment happens here, as codegen'd column expressions —
no Python in the path, no shuffle (it is a pure per-row projection),
and the tile id doubles as the partition / bucketing key for
downstream per-tile assembly (`geo/tiles.tile_feature_collections`
accepts any tile column, including a quadkey).

Scheme (the standard slippy-map / Bing / Mapbox convention):

* ``x = floor((lon + 180) / 360 · 2^z)``
* ``y = floor((1 − asinh(tan φ)/π) / 2 · 2^z)`` with φ clamped to the
  Web-Mercator singularity bound ±85.05112877980659° (= atan(sinh π)),
  written as ``ln(tan φ + sec φ)`` which both the JVM and C libm
  evaluate from the same double inputs.
* quadkey = base-4 string interleaving the bits of (x, y) from the
  most significant zoom level down — tile (x=3, y=5, z=3) → ``"213"``.
  A quadkey's prefix at length k IS the ancestor tile at zoom k, so
  prefix range-scans give pyramid rollups for free on a sorted layout.

Pyramid note: parent tiles need no re-projection — ``x_parent =
x >> Δz`` exactly, so rollups from a base zoom are integer shifts
(map-side, exact), the same trick `functions.s2_token_of` uses for S2
ancestors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# atan(sinh(pi)) in degrees — latitude where Web-Mercator y diverges
MAX_MERCATOR_LAT = 85.05112877980659


def tile_x(lon: Column, zoom: int) -> Column:
    """Slippy tile x at ``zoom`` (int column; null lon → null)."""
    n = float(1 << zoom)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("int")
    # greatest/least skip nulls (they'd turn null → 0), so gate the clamp
    return F.when(
        x.isNotNull(),
        F.least(F.greatest(x, F.lit(0)), F.lit((1 << zoom) - 1)),
    )


def tile_y(lat: Column, zoom: int) -> Column:
    """Slippy tile y at ``zoom`` (int column; lat clamped to the
    Mercator bound so poles land in the edge tile row, not overflow)."""
    n = float(1 << zoom)
    lat_c = F.greatest(
        F.least(lat, F.lit(MAX_MERCATOR_LAT)), F.lit(-MAX_MERCATOR_LAT)
    )
    lat_r = F.radians(lat_c)
    merc = (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0
    y = F.floor(merc * n).cast("int")
    return F.when(
        y.isNotNull(),
        F.least(F.greatest(y, F.lit(0)), F.lit((1 << zoom) - 1)),
    )


def quadkey(x: Column, y: Column, zoom: int) -> Column:
    """Bing/Mapbox quadkey of tile (x, y, zoom) — ``zoom`` concatenated
    base-4 digits, most significant level first.  Pure bit ops, fully
    codegen'd; zoom is a plan-time literal so the concat unrolls."""
    digits = []
    for i in range(zoom, 0, -1):
        bx = F.shiftright(x, i - 1).bitwiseAND(F.lit(1))
        by = F.shiftright(y, i - 1).bitwiseAND(F.lit(1))
        digits.append((bx + by * 2).cast("string"))
    return F.concat(*digits)


def assign_xyz(
    features: DataFrame,
    zooms: tuple[int, ...] = (7, 12),
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """features(+lon/lat) → + ``x{z}``, ``y{z}``, ``qk{z}`` per zoom.

    Mirrors `functions.assign_tiles` for the H3/S2 lattices; null
    coordinates yield null tile columns (floor/concat null
    propagation), matching the geometry-presence contract."""
    out = features
    lon, lat = F.col(lon_col), F.col(lat_col)
    for z in zooms:
        x, y = tile_x(lon, z), tile_y(lat, z)
        out = (
            out.withColumn(f"x{z}", x)
            .withColumn(f"y{z}", y)
            .withColumn(f"qk{z}", quadkey(F.col(f"x{z}"), F.col(f"y{z}"), z))
        )
    return out
