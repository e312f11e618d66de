"""Polygon simplification (Douglas–Peucker) — the zoom-dependent
geometry-thinning stage a tile pipeline runs before assembly: at zoom
z a vertex closer than ~a-pixel to the chord it sits on is invisible,
so shipping it to every tile consumer is pure cost. The reference
emits full-resolution rings (DeliveryPublicationStreamToGeoJson.java
writes geometry verbatim); this engine adds the standard MVT-style
reduction.

Deterministic: classic DP with ties broken to the FIRST index of the
maximal distance, so the kept-vertex set is a pure function of
(ring, tolerance) — partitioning-invariant, and parity-testable
against a pure-Python reference implementation. Distances are planar
in degree space, consistent with the rasterizer/tiler (geo/xyz
operates on lon/lat planes; for metric tolerances convert via
~111,320 m/deg at the equator scaled by cos(lat)).

Scale shape: one mapInPandas over polygon rows — embarrassingly
parallel, no shuffle; each ring is simplified once by an O(n log n)
expected stack-based kernel (numpy-vectorized per segment)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .wkt import parse_polygon


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker keep-mask over an open polyline (first and last
    vertices always kept). Ties on the max distance break to the first
    index (np.argmax), pinning determinism."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        px, py = xs[i + 1:j], ys[i + 1:j]
        ax, ay = xs[i], ys[i]
        bx, by = xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d = np.hypot(px - ax, py - ay)
        else:
            # distance to the CLAMPED segment, not the infinite line: a
            # spike that extends past the chord's endpoints is nearly
            # colinear with the infinite line (tiny perpendicular
            # distance) yet arbitrarily far from the chain — line-based
            # DP silently amputates such peninsulas, breaking the
            # within-tolerance guarantee (regression-tested)
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / seg2, 0.0, 1.0)
            d = np.hypot(px - (ax + t * dx), py - (ay + t * dy))
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Simplify a closed ring given WITHOUT the duplicated closing
    vertex (the parse_polygon convention). Anchors: vertex 0 and the
    vertex farthest from it (fixing only v0 would let DP collapse a
    ring whose far side is colinear with v0's chord). Returns the kept
    vertices (ordered, still unclosed); rings that would drop below 3
    vertices return unchanged — a degenerate polygon is worse than an
    unsimplified one."""
    n = len(ring)
    if n <= 3:
        return ring
    d0 = np.hypot(ring[:, 0] - ring[0, 0], ring[:, 1] - ring[0, 1])
    far = int(np.argmax(d0))
    if far == 0:
        return ring
    # two open chains: 0..far and far..n-1..0 (wrap closed)
    xs = np.concatenate([ring[:, 0], ring[:1, 0]])
    ys = np.concatenate([ring[:, 1], ring[:1, 1]])
    keep = np.zeros(n + 1, dtype=bool)
    m1 = dp_keep_mask(xs[: far + 1], ys[: far + 1], tol)
    m2 = dp_keep_mask(xs[far:], ys[far:], tol)
    keep[: far + 1] |= m1
    keep[far:] |= m2
    kept = ring[keep[:n]]
    if len(kept) < 3:
        return ring
    return kept


def simplify_polygons(zones: DataFrame, tolerance: float,
                      id_col: str = "zone_id",
                      geom_col: str = "geom_wkt") -> DataFrame:
    """(id, geom_wkt simplified, n_before, n_after) — exterior-ring
    Douglas–Peucker per polygon row, WKT in/out (7-dp coords, the
    repo-wide precision)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, zones.schema[id_col].dataType),
            T.StructField(geom_col, T.StringType()),
            T.StructField("n_before", T.IntegerType()),
            T.StructField("n_after", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, wkts, nb, na = [], [], [], []
            for rid, wkt in zip(pdf[id_col], pdf[geom_col]):
                if wkt is None or not wkt.startswith("POLYGON"):
                    # null / non-POLYGON geometry (POINT, MULTIPOLYGON,
                    # ...): simplification is the identity — pass
                    # through UNCHANGED. Gating on the type tag, not on
                    # "((" (ADVICE r02): parse_polygon reads only the
                    # first ring, so a MULTIPOLYGON matched by "((" was
                    # silently rewritten as a single-ring POLYGON —
                    # a topology change, not a simplification.
                    ids.append(rid)
                    wkts.append(wkt)
                    nb.append(0)
                    na.append(0)
                    continue
                ring = parse_polygon(wkt)
                # parse_polygon keeps the WKT closing duplicate; the
                # DP kernel wants the unclosed ring
                if len(ring) > 1 and (ring[0] == ring[-1]).all():
                    ring = ring[:-1]
                simp = simplify_ring(ring, tolerance)
                coords = ", ".join(f"{x:.7f} {y:.7f}" for x, y in simp)
                first = f"{simp[0, 0]:.7f} {simp[0, 1]:.7f}"
                ids.append(rid)
                wkts.append(f"POLYGON(({coords}, {first}))")
                nb.append(len(ring))
                na.append(len(simp))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    geom_col: wkts,
                    "n_before": np.array(nb, dtype=np.int32),
                    "n_after": np.array(na, dtype=np.int32),
                }
            )

    return zones.select(id_col, geom_col).mapInPandas(kernel, out_schema)
