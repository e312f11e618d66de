"""Tile assembly + raster↔vector conversion (SURVEY.md §7.2 step 6).

* ``tile_feature_collections`` — one Mapbox-compatible GeoJSON
  FeatureCollection per tile cell: ``groupBy(tile).applyInPandas``
  with the per-feature JSON already rendered JVM-side (geojson.py), so
  the Python side only concatenates strings per group. Features are
  ordered (section, feature_id) inside each tile for determinism.
* ``rasterize_density`` — raster side: per-cell feature counts at a
  hex resolution (a pure groupBy().count() — one shuffle, map-side
  partial aggregation).
* ``vectorize_cells`` — vector side: hex cell id → its boundary
  polygon WKT via an Arrow-batched UDF (mapInPandas over cell batches).

Salting note (north_rule): tile groups inherit the Zipf skew of urban
cells. applyInPandas here only concatenates, so the skewed group cost
is linear in group size; for heavy per-tile computation the pattern is
to pre-split hot cells with a salt column and merge per (cell, salt)
results — rasterize_density needs no salt because partial aggregation
already collapses rows map-side.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import hexgrid
from ..geojson import feature_json

TILE_SCHEMA = "tile string, n_features long, feature_collection string"


def tile_feature_collections(features: DataFrame, tile_col: str = "h3_r7") -> DataFrame:
    """features (with tile cell column) → one FeatureCollection per tile.

    Pure built-in aggregation (collect_list + array_sort + array_join):
    stays in the JVM, benefits from AQE coalescing, and sorts features
    (section, feature_id) inside each tile via struct ordering."""
    rendered = feature_json(features).select(
        F.col(tile_col).alias("tile"), "section", "feature_id", "feature_json"
    ).filter(F.col("tile").isNotNull())
    entry = F.struct("section", "feature_id", "feature_json")
    return rendered.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_features"),
        F.concat(
            F.lit('{"features": ['),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(entry)),
                    lambda e: e["feature_json"],
                ),
                ",",
            ),
            F.lit('], "type": "FeatureCollection"}'),
        ).alias("feature_collection"),
    )


def rasterize_density(features: DataFrame, tile_col: str = "h3_r9") -> DataFrame:
    """Hex-raster density grid: (cell, n) — partial-agg'd groupBy."""
    return (
        features.filter(F.col(tile_col).isNotNull())
        .groupBy(F.col(tile_col).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _hex_boundary_wkt(q: int, r: int, res: int) -> str:
    """Boundary polygon of axial cell (q, r) at ``res`` as WKT."""
    s = hexgrid.EDGE_M[res]
    cx = s * math.sqrt(3.0) * (q + r / 2.0)
    cy = s * 1.5 * r
    # pointy-top hexagon vertices in projected meters
    pts = []
    for i in range(6):
        ang = math.pi / 180.0 * (60.0 * i - 30.0)
        pts.append((cx + s * math.cos(ang), cy + s * math.sin(ang)))
    pts.append(pts[0])
    lat_ref = math.degrees(cy / hexgrid.EARTH_RADIUS_M)
    cos_l = math.cos(math.radians(lat_ref)) or 1e-9
    ring = ", ".join(
        f"{math.degrees(x / (hexgrid.EARTH_RADIUS_M * cos_l)):.7f} "
        f"{math.degrees(y / hexgrid.EARTH_RADIUS_M):.7f}"
        for x, y in pts
    )
    return f"POLYGON(({ring}))"


def vectorize_cells(raster: DataFrame, cell_col: str = "cell") -> DataFrame:
    """raster(cell, n) → + geom_wkt hex boundary (vector side)."""

    def to_vec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wkts = []
            for c in pdf[cell_col]:
                res, q, r = hexgrid.parse_cell(c)
                wkts.append(_hex_boundary_wkt(q, r, res))
            yield pdf.assign(geom_wkt=wkts)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in raster.schema.fields
    ) + ", geom_wkt string"
    return raster.mapInPandas(to_vec, schema=out_schema)
