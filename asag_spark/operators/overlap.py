"""Polygon–polygon intersection join (zone overlap).

Absent from the reference (its zones never meet each other —
`ZoneToGeoJsonFeatureMapper.java` maps them independently); required
for zone-overlap analytics at scale. The shape follows the
raster-signature approach of "Raster Intervals" (SIGMOD 2023, see
PAPERS.md): polygons join on a rasterized cover first, exact geometry
only runs on surviving candidates.

1. **Candidates**: each side is exploded to its res-``res`` hex-cell
   bbox cover (`pip.zone_covers` — the same signature the PIP join
   broadcasts). An equi-join on the cell id + `dropDuplicates` yields
   candidate pairs; the shuffle carries only (zone_id, cell) strings,
   never geometry. Dense areas (Zipf cells) inflate candidates, not
   task skew — AQE splits the hot cell's join partitions.
   The default signature resolution is COARSE (res 5, ~8.5 km edge):
   polygon×polygon only needs the signature to overlap where the
   geometries might, and a res-7 cover of municipality-sized zones is
   ~50× more cells for no fewer refines (measured 70k cover rows →
   1.4k on the 50-zone bench, same 10 candidate pairs). Point×polygon
   (PIP) keeps res 7 because its pruning power scales with the POINT
   side's cell granularity.
2. **Refine** (Arrow kernel, per candidate pair): interiors intersect
   iff some edge pair properly crosses, or a representative point
   (ring centroid, falling back to vertices) of one ring lies inside
   the other. Boundary-only contact (shared edge, single touching
   vertex) is reported only when a representative point lands
   interior — document as interior-intersection semantics.

Scale: candidate count is the raster-join output (data-dependent);
refine cost is |candidates| × O(edges²) numpy per pair, partitioned by
the pair hash — no broadcast needed, both sides may be huge.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.wkt import parse_polygon, points_in_ring, ring_centroid
from .pip import zone_covers

OVERLAP_RES = 5


def _edges_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """Any proper (interior) crossing between edges of rings a and b —
    vectorized orientation tests over the full edge×edge grid."""
    p1x, p1y = a[:-1, 0][:, None], a[:-1, 1][:, None]
    p2x, p2y = a[1:, 0][:, None], a[1:, 1][:, None]
    q1x, q1y = b[:-1, 0][None, :], b[:-1, 1][None, :]
    q2x, q2y = b[1:, 0][None, :], b[1:, 1][None, :]
    d1 = (q2x - q1x) * (p1y - q1y) - (q2y - q1y) * (p1x - q1x)
    d2 = (q2x - q1x) * (p2y - q1y) - (q2y - q1y) * (p2x - q1x)
    d3 = (p2x - p1x) * (q1y - p1y) - (p2y - p1y) * (q1x - p1x)
    d4 = (p2x - p1x) * (q2y - p1y) - (p2y - p1y) * (q2x - p1x)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def _interior_point_inside(a: np.ndarray, b: np.ndarray) -> bool:
    """Representative point of ring a inside ring b (centroid first,
    vertices as fallback for centroid-outside non-convex rings)."""
    cx, cy = ring_centroid(a)
    probe_x = np.concatenate(([cx], a[:-1, 0]))
    probe_y = np.concatenate(([cy], a[:-1, 1]))
    return bool(points_in_ring(probe_x, probe_y, b).any())


def rings_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    return (
        _edges_cross(a, b)
        or _interior_point_inside(a, b)
        or _interior_point_inside(b, a)
    )


def zone_overlap_join(
    zones_a: DataFrame,
    zones_b: DataFrame | None = None,
    res: int = OVERLAP_RES,
) -> DataFrame:
    """(zone_a, zone_b) pairs whose polygon interiors intersect.

    Self-join when ``zones_b`` is None (emits each unordered pair once,
    ``zone_a < zone_b``)."""
    self_join = zones_b is None
    zb = zones_a if self_join else zones_b

    a_cov = zone_covers(zones_a, res=res).withColumnRenamed("zone_id", "zone_a")
    b_cov = zone_covers(zb, res=res).withColumnRenamed("zone_id", "zone_b")
    cand = a_cov.join(b_cov, "cell").select("zone_a", "zone_b")
    if self_join:
        cand = cand.filter(F.col("zone_a") < F.col("zone_b"))
    cand = cand.dropDuplicates(["zone_a", "zone_b"])

    wkt_a = zones_a.select(
        F.col("zone_id").alias("zone_a"), F.col("geom_wkt").alias("wkt_a")
    )
    wkt_b = zb.select(
        F.col("zone_id").alias("zone_b"), F.col("geom_wkt").alias("wkt_b")
    )
    pairs = cand.join(wkt_a, "zone_a").join(wkt_b, "zone_b")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rings: dict[str, np.ndarray] = {}

        def ring_of(key: str, wkt: str) -> np.ndarray:
            r = rings.get(key)
            if r is None:
                r = rings[key] = parse_polygon(wkt)
            return r

        for pdf in batches:
            keep = [
                rings_intersect(ring_of(za, wa), ring_of(zb_, wb))
                for za, zb_, wa, wb in zip(
                    pdf["zone_a"], pdf["zone_b"], pdf["wkt_a"], pdf["wkt_b"]
                )
            ]
            yield pdf.loc[keep, ["zone_a", "zone_b"]]

    return pairs.mapInPandas(refine, schema="zone_a string, zone_b string")
