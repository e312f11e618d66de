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


def rasterize_polygons_xyz(
    zones: DataFrame, zoom: int, extent: int = 16
) -> DataFrame:
    """Polygon → Web-Mercator pixel coverage: (zone_id, x, y, n_pixels)
    — how many of the extent×extent pixel centers of tile (x, y, zoom)
    fall inside the zone's exterior ring (even-odd ray cast, the same
    refine primitive the PIP join uses).

    Two Arrow stages with a thin tile-keyed exchange between them:

    * Stage A explodes each polygon to the z/x/y tiles covering its
      bbox — work and output ∝ covered tiles, never extent².
    * The exchange repartitions on (x, y), so a continent-sized polygon
      fans its tiles across the cluster instead of pinning one task
      (the polygon-side analog of the north_rule's salted-cell story).
    * Stage B tests the extent² pixel centers per (zone, tile) row,
      vectorized per row; tiles with zero covered pixels are dropped.

    The pixel-center rule means ring boundary semantics are inherited
    from points_in_ring (half-open crossing number).
    """
    from .wkt import parse_polygon, points_in_ring, ring_bbox
    from .xyz import np_merc_fxy, np_pixel_center_lonlat

    n_tiles = 1 << zoom

    def to_tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            zids, xs, ys, wkts = [], [], [], []
            for zid, wkt in zip(pdf["zone_id"], pdf["geom_wkt"]):
                lo_x, lo_y, hi_x, hi_y = ring_bbox(parse_polygon(wkt))
                fx, fy = np_merc_fxy(
                    np.array([lo_x, hi_x]), np.array([hi_y, lo_y]), zoom
                )
                x0, x1 = int(fx[0]), min(int(fx[1]), n_tiles - 1)
                y0, y1 = int(fy[0]), min(int(fy[1]), n_tiles - 1)
                for x in range(max(x0, 0), x1 + 1):
                    for y in range(max(y0, 0), y1 + 1):
                        zids.append(zid)
                        xs.append(x)
                        ys.append(y)
                        wkts.append(wkt)
            yield pd.DataFrame(
                {"zone_id": zids, "x": xs, "y": ys, "geom_wkt": wkts}
            )

    candidates = (
        zones.select("zone_id", "geom_wkt")
        .mapInPandas(to_tiles, schema="zone_id string, x int, y int, geom_wkt string")
        .repartition(F.col("x"), F.col("y"))
    )

    # one tile's pixel-center offsets, reused across rows
    pix = np.arange(extent, dtype=np.float64)
    ppx, ppy = np.meshgrid(pix, pix, indexing="ij")
    ppx, ppy = ppx.ravel(), ppy.ravel()

    def count_pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rings: dict[str, np.ndarray] = {}
        for pdf in batches:
            counts = []
            for zid, x, y, wkt in zip(
                pdf["zone_id"], pdf["x"], pdf["y"], pdf["geom_wkt"]
            ):
                lon, lat = np_pixel_center_lonlat(
                    float(x), float(y), ppx, ppy, zoom, extent
                )
                ring = rings.get(zid)
                if ring is None:
                    ring = rings[zid] = parse_polygon(wkt)
                counts.append(int(points_in_ring(lon, lat, ring).sum()))
            out = pdf.assign(n_pixels=counts).drop(columns=["geom_wkt"])
            yield out[out["n_pixels"] > 0]

    return candidates.mapInPandas(
        count_pixels, schema="zone_id string, x int, y int, n_pixels long"
    )


def vectorize_cells(raster: DataFrame, cell_col: str = "cell") -> DataFrame:
    """raster(cell, n) → + geom_wkt hex boundary (vector side).

    Pure JVM expressions: the six pointy-top vertex offsets are the
    plan-time constants (±s·√3/2, ±s/2), (0, ±s), so the boundary is
    arithmetic + ``format_string`` — no Python worker in the path (the
    earlier Arrow kernel looped per cell; a raster table at web scale
    has billions of cells). Matches the python reference twin
    `_hex_boundary_wkt` digit-for-digit (%.7f), which tests assert."""
    parts = F.split(F.col(cell_col), "_")
    res = F.substring(parts[0], 2, 8).cast("int")
    q = parts[1].cast("double")
    r = parts[2].cast("double")
    s = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in hexgrid.EDGE_M.items() for v in kv]
        ),
        res,
    )
    R = hexgrid.EARTH_RADIUS_M
    sqrt3 = math.sqrt(3.0)
    cx = s * sqrt3 * (q + r / 2.0)
    cy = s * 1.5 * r
    lat_ref = F.degrees(cy / R)
    cos_l_raw = F.cos(F.radians(lat_ref))
    cos_l = F.when(cos_l_raw == 0.0, 1e-9).otherwise(cos_l_raw)
    # vertex offsets at angles 60·i−30° — evaluated with the same
    # math.cos/math.sin calls as the python twin so the doubles (and
    # therefore the %.7f digits) are bit-identical
    offs = [
        (
            math.cos(math.pi / 180.0 * (60.0 * i - 30.0)),
            math.sin(math.pi / 180.0 * (60.0 * i - 30.0)),
        )
        for i in range(6)
    ]
    verts = []
    for ox, oy in offs + offs[:1]:
        lon = F.degrees((cx + s * ox) / (F.lit(float(R)) * cos_l))
        lat = F.degrees((cy + s * oy) / R)
        verts.append(F.format_string("%.7f %.7f", lon, lat))
    wkt = F.concat(
        F.lit("POLYGON(("), F.concat_ws(", ", *verts), F.lit("))")
    )
    return raster.withColumn("geom_wkt", wkt)


def smooth_cell_counts(cells: DataFrame, count_col: str = "n") -> DataFrame:
    """Hex focal-mean smoothing of a cell raster: smoothed(c) =
    (sum of counts over grid_disk(c, 1)) / 7, absent neighbors
    contributing 0 — the standard focal filter over the engine's axial
    lattice (hexgrid.grid_disk), e.g. de-noising a stop-density raster
    before contouring.

    Plan shape: a SCATTER, not a gather — each occupied cell explodes
    to its 7 disk cells via a plan-time literal offset array (pure
    JVM, no UDF) and ONE map-combined groupBy(target) sums the
    contributions. Shuffle carries <= 7 x occupied cells — never the
    raw points, and no self-join against a neighbor list exists. Cells
    with no occupied neighbor stay absent (their smoothed value is 0
    by definition and materializing the infinite empty lattice is not
    a thing).

    Input: (cell 'h{res}_{q}_{r}', <count_col>). Output:
    (cell, smoothed) — smoothed rounded to 6 dp.
    """
    from . import hexgrid

    parts = F.split(F.col("cell"), "_")
    prefix = F.element_at(parts, 1)  # 'h{res}' — res rides the input
    q = F.element_at(parts, 2).cast("int")
    r = F.element_at(parts, 3).cast("int")
    offsets = F.array(*[
        F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
        for dq, dr in hexgrid.grid_disk(0, 0, 1)
    ])
    scattered = cells.select(
        F.col(count_col).alias("_n"),
        prefix.alias("_p"), q.alias("_q"), r.alias("_r"),
        F.explode(offsets).alias("_o"),
    ).select(
        F.concat_ws(
            "_", F.col("_p"),
            (F.col("_q") + F.col("_o.dq")).cast("string"),
            (F.col("_r") + F.col("_o.dr")).cast("string"),
        ).alias("cell"),
        "_n",
    )
    return scattered.groupBy("cell").agg(
        F.round(F.sum("_n") / 7.0, 6).alias("smoothed")
    )
