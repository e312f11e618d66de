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

from pyspark.sql import Column, DataFrame, Window
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
    if zoom == 0:
        # the root tile's quadkey is the empty string (Bing spec: a
        # level-N key has N digits); still propagate null tile ids so
        # the null-coordinate contract of assign_xyz holds at zoom 0
        return F.when(x.isNotNull() & y.isNotNull(), F.lit(""))
    digits = []
    for i in range(zoom, 0, -1):
        bx = F.shiftright(x, i - 1).bitwiseAND(F.lit(1))
        by = F.shiftright(y, i - 1).bitwiseAND(F.lit(1))
        digits.append((bx + by * 2).cast("string"))
    return F.concat(*digits)


def _merc_fx(lon: Column, zoom: int) -> Column:
    """Continuous Web-Mercator x in tile units at ``zoom``."""
    return (lon + 180.0) / 360.0 * float(1 << zoom)


def _merc_fy(lat: Column, zoom: int) -> Column:
    """Continuous Web-Mercator y in tile units at ``zoom``."""
    lat_c = F.greatest(
        F.least(lat, F.lit(MAX_MERCATOR_LAT)), F.lit(-MAX_MERCATOR_LAT)
    )
    lat_r = F.radians(lat_c)
    return (
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi)
        / 2.0 * float(1 << zoom)
    )


def _local(f: Column, tile: Column, extent: int) -> Column:
    """Tile-local integer coordinate: floor of the fractional tile
    position scaled to ``extent``, clamped to [0, extent-1] (points on
    the far edge land in the last cell, matching the tile clamp)."""
    px = F.floor((f - tile) * float(extent)).cast("int")
    return F.when(
        px.isNotNull(),
        F.least(F.greatest(px, F.lit(0)), F.lit(extent - 1)),
    )


def mvt_coords(
    lon: Column, lat: Column, zoom: int, extent: int = 4096
) -> tuple[Column, Column, Column, Column]:
    """(tile_x, tile_y, local_x, local_y) — the Mapbox-vector-tile
    geometry encoding: tile id + integer coordinates in tile-local
    space at ``extent`` (MVT default 4096; 256 gives raster pixel
    bins).  One shared mercator projection feeds both the tile index
    and the quantized offset, so a point can never quantize into a
    different tile than it is assigned to."""
    fx, fy = _merc_fx(lon, zoom), _merc_fy(lat, zoom)
    x, y = tile_x(lon, zoom), tile_y(lat, zoom)
    return x, y, _local(fx, x, extent), _local(fy, y, extent)


def rasterize_xyz(
    df: DataFrame,
    zoom: int,
    extent: int = 256,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Web-Mercator raster density: count per (tile, pixel) at
    ``zoom``/``extent`` — the raster side of raster↔vector in Mapbox
    tile space (the hex-lattice analog is `tiles.rasterize_density`).
    Pure projection + one partial-agg'd groupBy; the tile id leads the
    grouping key so per-tile rasters are contiguous after the shuffle
    and a downstream `groupBy(x, y).applyInPandas` PNG/array encoder
    is partition-local."""
    x, y, px, py = mvt_coords(F.col(lon_col), F.col(lat_col), zoom, extent)
    return (
        df.select(x.alias("x"), y.alias("y"), px.alias("px"), py.alias("py"))
        .filter(F.col("x").isNotNull())
        .groupBy("x", "y", "px", "py")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _inv_lon(fx: Column, zoom: int) -> Column:
    """Inverse mercator: continuous tile-unit x → longitude."""
    return fx / float(1 << zoom) * 360.0 - 180.0


def _inv_lat(fy: Column, zoom: int) -> Column:
    """Inverse mercator: continuous tile-unit y → latitude (the
    gudermannian, via atan∘sinh — both codegen'd JVM built-ins)."""
    return F.degrees(
        F.atan(F.sinh(math.pi * (1.0 - 2.0 * fy / float(1 << zoom))))
    )


def vectorize_xyz(
    raster: DataFrame, zoom: int, extent: int = 256
) -> DataFrame:
    """Raster → vector in Mapbox tile space: each (x, y, px, py) pixel
    gains its center coordinates and lon/lat bounds plus a bbox polygon
    WKT — the inverse of `rasterize_xyz`, entirely JVM expressions (the
    hex-lattice analog `tiles.vectorize_cells` needs an Arrow UDF
    because hex boundaries aren't closed-form in Catalyst; mercator
    boxes are)."""
    e = float(extent)
    fx0 = F.col("x") + F.col("px") / e
    fx1 = F.col("x") + (F.col("px") + 1.0) / e
    fy0 = F.col("y") + F.col("py") / e
    fy1 = F.col("y") + (F.col("py") + 1.0) / e
    w, ee = _inv_lon(fx0, zoom), _inv_lon(fx1, zoom)
    # fy grows southward: fy0 is the NORTH edge of the pixel
    n_, s = _inv_lat(fy0, zoom), _inv_lat(fy1, zoom)
    cx = _inv_lon(F.col("x") + (F.col("px") + 0.5) / e, zoom)
    cy = _inv_lat(F.col("y") + (F.col("py") + 0.5) / e, zoom)
    ring = F.concat_ws(
        ", ",
        F.concat_ws(" ", w, s), F.concat_ws(" ", ee, s),
        F.concat_ws(" ", ee, n_), F.concat_ws(" ", w, n_),
        F.concat_ws(" ", w, s),
    )
    return (
        raster.withColumn("lon", cx)
        .withColumn("lat", cy)
        .withColumn("lon_min", w).withColumn("lon_max", ee)
        .withColumn("lat_min", s).withColumn("lat_max", n_)
        .withColumn("geom_wkt", F.concat(F.lit("POLYGON(("), ring, F.lit("))")))
    )


def tile_pyramid(
    df: DataFrame,
    base_zoom: int,
    min_zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Multi-zoom tile-count pyramid: (zoom, x, y, n) for every zoom in
    [min_zoom, base_zoom] — the hypertable-rollup analog for map tiles.

    Scale shape: ONE wide aggregation touches the raw rows (base-zoom
    groupBy, map-side partial agg); the pyramid is then an explode of
    the zoom list ON THE AGGREGATED ROWS followed by shifted re-group —
    per-level integer shifts (exact, no re-projection) inside one plan,
    so the base aggregation runs once (a per-level union would re-run
    it levels times — measured 8× the cost) and the rollup's shuffle
    volume is levels × base_tiles, independent of the input row count.
    """
    x, y = tile_x(F.col(lon_col), base_zoom), tile_y(F.col(lat_col), base_zoom)
    base = (
        df.select(x.alias("x"), y.alias("y"))
        .filter(F.col("x").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    zooms = F.array(*[F.lit(z) for z in range(min_zoom, base_zoom + 1)])
    return (
        base.select(F.explode(zooms).alias("zoom"), "x", "y", "n")
        .select(
            "zoom",
            F.expr(f"shiftright(x, {base_zoom} - zoom)").alias("x"),
            F.expr(f"shiftright(y, {base_zoom} - zoom)").alias("y"),
            "n",
        )
        .groupBy("zoom", "x", "y")
        .agg(F.sum("n").alias("n"))
    )


# -- numpy twins (used inside Arrow UDFs; same formulas as the JVM
#    expressions above, mirroring the hexgrid JVM/numpy twin pattern) --

def np_merc_fxy(lon, lat, zoom: int):
    """Continuous Web-Mercator (fx, fy) in tile units — numpy."""
    import numpy as np

    n = float(1 << zoom)
    fx = (lon + 180.0) / 360.0 * n
    lat_c = np.clip(lat, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    lr = np.radians(lat_c)
    fy = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / math.pi) / 2.0 * n
    return fx, fy


def np_pixel_center_lonlat(x, y, px, py, zoom: int, extent: int):
    """Inverse mercator: center of pixel (px, py) in tile (x, y)."""
    import numpy as np

    n = float(1 << zoom)
    fx = x + (px + 0.5) / float(extent)
    fy = y + (py + 0.5) / float(extent)
    lon = fx / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(math.pi * (1.0 - 2.0 * fy / n))))
    return lon, lat


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


def clip_ring(fx, fy, x0: float, y0: float, x1: float, y1: float):
    """Sutherland–Hodgman clip of ring (fx, fy) — OPEN vertex arrays,
    no closing repeat — against the axis-aligned window
    [x0,x1] × [y0,y1]. Returns (cfx, cfy) open arrays; length 0 when
    the intersection is empty or degenerate (area 0).

    The clip window is convex, so S-H is exact for any simple subject
    ring (non-convex subjects may gain zero-width bridge edges where
    they exit/re-enter the window — those carry zero area, which is
    why the per-tile areas of a grid clip sum EXACTLY to the ring's
    area; tests/test_xyz.py pins that partition property)."""
    import numpy as np

    verts = list(zip(map(float, fx), map(float, fy)))
    # each edge: (is_x_axis, bound, keep_greater)
    for axis, bound, keep_ge in (
        (0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False),
    ):
        if not verts:
            return np.empty(0), np.empty(0)
        out = []
        prev = verts[-1]
        prev_in = (prev[axis] >= bound) if keep_ge else (prev[axis] <= bound)
        for cur in verts:
            cur_in = (cur[axis] >= bound) if keep_ge else (cur[axis] <= bound)
            if cur_in != prev_in:
                # intersection of segment prev→cur with the bound line
                t = (bound - prev[axis]) / (cur[axis] - prev[axis])
                pt = (
                    prev[0] + t * (cur[0] - prev[0]),
                    prev[1] + t * (cur[1] - prev[1]),
                )
                # snap the clipped coordinate exactly onto the bound
                pt = (bound, pt[1]) if axis == 0 else (pt[0], bound)
                out.append(pt)
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
        verts = out
    if len(verts) < 3:
        return np.empty(0), np.empty(0)
    cfx = np.array([v[0] for v in verts])
    cfy = np.array([v[1] for v in verts])
    area2 = float(np.dot(cfx, np.roll(cfy, -1)) - np.dot(cfy, np.roll(cfx, -1)))
    if area2 == 0.0:
        return np.empty(0), np.empty(0)
    return cfx, cfy


def clip_polygons_to_tiles(polys: DataFrame, zoom: int = 9,
                           extent: int = 4096,
                           id_col: str = "feature_id",
                           wkt_col: str = "geom_wkt") -> DataFrame:
    """Slice polygon features into Web-Mercator z/x/y tiles — the MVT
    tiling step the reference delegates to Mapbox's upload service
    (MapBoxUpdateRouteBuilder.java:109-122 ships the whole
    FeatureCollection; the service clips server-side). At 100 TB the
    clip must be an engine operator: each polygon is projected once to
    fractional tile coords (np_merc_fxy), its bbox names the covered
    tile range, and a Sutherland–Hodgman clip against each tile window
    emits the tile-local geometry quantized to MVT extent-4096 integer
    coords.

    Plan shape: ONE mapInPandas pass, zero exchanges — tile fan-out is
    data-dependent (bbox area), not a shuffle; downstream per-tile
    assembly repartitions by (x, y) exactly like
    tiles.tile_feature_collections. A continent-sized polygon fans out
    to many rows inside its batch; rasterize_polygons_xyz's two-stage
    tile-keyed variant is the template if per-feature fan-out ever
    needs spreading across tasks.

    Output: (<id_col>, x, y, mvt_ring) — mvt_ring = "px,py px,py ..."
    open ring, integer extent-local coords (may touch 0/extent),
    empty-intersection tiles omitted.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .wkt import parse_polygon

    out_schema = T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("mvt_ring", T.StringType()),
    ])
    n_tiles = 1 << zoom

    def kernel(batches):
        for pdf in batches:
            ids, xs, ys, rings = [], [], [], []
            for fid, wkt in zip(pdf[id_col], pdf[wkt_col]):
                if wkt is None or not wkt.startswith("POLYGON"):
                    continue
                ring = parse_polygon(wkt)[:-1]  # open ring
                fx, fy = np_merc_fxy(ring[:, 0], ring[:, 1], zoom)
                tx0 = max(int(np.floor(fx.min())), 0)
                tx1 = min(int(np.floor(fx.max())), n_tiles - 1)
                ty0 = max(int(np.floor(fy.min())), 0)
                ty1 = min(int(np.floor(fy.max())), n_tiles - 1)
                for tx in range(tx0, tx1 + 1):
                    for ty in range(ty0, ty1 + 1):
                        cfx, cfy = clip_ring(
                            fx, fy, tx, ty, tx + 1.0, ty + 1.0
                        )
                        if not len(cfx):
                            continue
                        px = np.rint((cfx - tx) * extent).astype(np.int64)
                        py = np.rint((cfy - ty) * extent).astype(np.int64)
                        # drop consecutive duplicates after quantization
                        keep = np.ones(len(px), dtype=bool)
                        keep[1:] = (px[1:] != px[:-1]) | (py[1:] != py[:-1])
                        if keep.sum() and (
                            px[keep][0] == px[keep][-1]
                            and py[keep][0] == py[keep][-1]
                            and keep.sum() > 1
                        ):
                            keep[np.where(keep)[0][-1]] = False
                        px, py = px[keep], py[keep]
                        if len(px) < 3:
                            continue
                        ids.append(fid)
                        xs.append(tx)
                        ys.append(ty)
                        rings.append(" ".join(
                            f"{a},{b}" for a, b in zip(px, py)
                        ))
            yield pd.DataFrame(
                {id_col: ids, "x": pd.array(xs, dtype="int32"),
                 "y": pd.array(ys, dtype="int32"), "mvt_ring": rings}
            )

    return polys.select(id_col, wkt_col).mapInPandas(kernel, schema=out_schema)


# Strategy gate for compact_tiles (the dedup_clusters closure idiom,
# operators/dedup.py): a cover of <= this many distinct tiles compacts
# DRIVER-SIDE in one numpy pass over the collected (x, y) list (4M
# tiles ~ 32 MB) instead of paying a window-exchange's fixed cost per
# zoom level (measured: the z12->z0 chain over a 2,121-tile cover
# spent ~3.4 s in 12 near-empty exchanges at local[32]; the numpy pass
# is ~1 ms). Above the gate the per-level frontier chain runs
# unchanged — a z15 continental cover (10^9 tiles) never collects.
COMPACT_COLLECT_MAX_TILES = 4_000_000


def _compact_driver(tile_pdf, zoom: int, min_zoom: int):
    """Driver-side quadtree compaction of an Arrow-collected tile
    frame — fully vectorized (no per-row Python objects anywhere,
    review r3): the same per-level promotion rule as the distributed
    chain (np.unique on packed parent keys stands in for the window
    count; dedupe is the initial np.unique). Returns a pandas frame
    (z, x, y) of int32."""
    import numpy as np
    import pandas as pd

    zs, xs, ys = [], [], []
    if len(tile_pdf):
        k = np.unique(
            (tile_pdf["x"].to_numpy(np.int64) << 32)
            | tile_pdf["y"].to_numpy(np.int64)
        )
        for z in range(zoom, min_zoom, -1):
            x = k >> 32
            y = k & 0xFFFFFFFF
            pk = ((x >> 1) << 32) | (y >> 1)
            up, inv, cnt = np.unique(
                pk, return_inverse=True, return_counts=True
            )
            keep = cnt[inv] < 4
            zs.append(np.full(int(keep.sum()), z, dtype=np.int32))
            xs.append(x[keep])
            ys.append(y[keep])
            k = up[cnt == 4]
        x = k >> 32
        y = k & 0xFFFFFFFF
        zs.append(np.full(len(k), min_zoom, dtype=np.int32))
        xs.append(x)
        ys.append(y)
    return pd.DataFrame({
        "z": np.concatenate(zs) if zs else np.array([], dtype=np.int32),
        "x": (np.concatenate(xs) if xs else np.array([])).astype(np.int32),
        "y": (np.concatenate(ys) if ys else np.array([])).astype(np.int32),
    })


def compact_tiles(tiles: DataFrame, zoom: int, min_zoom: int = 0,
                  x_col: str = "x", y_col: str = "y",
                  collect_max_tiles: int = COMPACT_COLLECT_MAX_TILES
                  ) -> DataFrame:
    """Quadtree compaction of a tile coverage set — the slippy-tile
    analogue of S2's CellUnion.Normalize / H3's compact: every
    complete quartet of siblings is replaced by its parent,
    recursively, yielding the MINIMAL mixed-zoom tile set covering
    exactly the same area. This is how a 100 TB coverage layer (e.g.
    "which tiles does this zone/corpus touch") is stored and shipped:
    compaction turns dense regions into a handful of low-zoom tiles
    while sparse fringes stay at high zoom.

    Plan shape: one bounded round per zoom level (zoom → min_zoom,
    plan-time constant). Each round is a SINGLE hash-partitioned
    window over the parent key (x>>1, y>>1) on the CURRENT frontier
    only: children in incomplete quartets are emitted at this level;
    complete quartets promote exactly one representative (the NW
    child, x%2==0 ∧ y%2==0) to the parent level — no distinct, no
    join, no second exchange. The frontier shrinks ≥4× per promoted
    level, so total shuffled bytes across all rounds are < 4/3 of the
    input level — strictly cheaper than one extra scan of the base
    set. All lazy: the driver never collects; the union across levels
    is a plan-time concat of ≤(zoom−min_zoom+1) branches.

    Input rows are (x, y) tiles at ``zoom`` (duplicates tolerated —
    the first round's window sees them via a pre-distinct which rides
    the same exchange). Output: (z, x, y) mixed-zoom minimal cover.
    """
    if not 0 <= min_zoom <= zoom:
        raise ValueError(f"need 0 <= min_zoom <= zoom, got {min_zoom}>{zoom}")
    cur = tiles.select(
        F.col(x_col).cast("int").alias("x"), F.col(y_col).cast("int").alias("y")
    ).distinct()
    # strategy gate (COMPACT_COLLECT_MAX_TILES): persist the distinct
    # cover, read its exact size, and compact small covers driver-side;
    # the persist is dropped either way — the distributed chain's first
    # window recomputes the distinct inside its own exchange, so the
    # large path pays only the one probe scan. collect_max_tiles=0
    # forces the distributed chain.
    if collect_max_tiles > 0:
        cur_p = cur.persist()
        try:
            n_tiles = cur_p.count()
            if n_tiles <= collect_max_tiles:
                pdf = cur_p.toPandas()  # Arrow path: columnar, no Rows
                return tiles.sparkSession.createDataFrame(
                    _compact_driver(pdf, zoom, min_zoom),
                    "z int, x int, y int",
                )
        finally:
            cur_p.unpersist()
    levels = []
    for z in range(zoom, min_zoom, -1):
        staged = cur.select(
            "x", "y",
            F.shiftright("x", 1).alias("px"), F.shiftright("y", 1).alias("py"),
        )
        n = F.count(F.lit(1)).over(Window.partitionBy("px", "py"))
        staged = staged.withColumn("_n", n)
        levels.append(
            staged.filter(F.col("_n") < 4)
            .select(F.lit(z).alias("z"), "x", "y")
        )
        cur = (
            staged.filter(
                (F.col("_n") == 4)
                & (F.col("x").bitwiseAND(1) == 0)
                & (F.col("y").bitwiseAND(1) == 0)
            ).select(F.col("px").alias("x"), F.col("py").alias("y"))
        )
    levels.append(cur.select(F.lit(min_zoom).alias("z"), "x", "y"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
# conv(n, 10, 32) digit alphabet (uppercase) -> geohash base32
_CONV32 = "0123456789ABCDEFGHIJKLMNOPQRSTUV"


def _morton_spread(v: Column) -> Column:
    """Spread bits of v (< 2^32) so bit i lands at position 2i — the
    classic 5-step magic-mask Morton dilation, O(1) expression size
    (a per-bit extract chain blows the generated method past janino's
    64 KiB limit and ejects the whole stage to interpreted mode)."""
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def geohash(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Standard geohash (Niemeyer base32) as a pure JVM expression —
    the fourth spatial index family next to the hex grid, S2 and xyz
    quadkeys (geohash prefixes are the join/prune key of choice in
    Elasticsearch/Lucene-shaped systems, and prefix truncation gives
    coarser cells for free, like quadkeys).

    Closed form instead of the textbook bisection loop: with
    b = 5·precision total bits, the first (most significant) bit
    splits longitude and bits alternate lon/lat, so the code is the
    bit-interleave of X = floor((lon+180)/360 · 2^ceil(b/2)) and
    Y = floor((lat+90)/180 · 2^floor(b/2)). The interleave is the
    5-step Morton magic-mask dilation (constant expression size —
    whole-stage codegen survives every precision; a per-bit chain
    compiled 660 extract terms at precision 11 and janino gave up),
    and base32 rendering is one conv(10→32) + translate + lpad.
    Verified against the canonical test vectors (ezs42, u4pruydqqvj)
    and a pure-Python bisection reference. Inputs clamped to valid
    ranges; null lon/lat → null. DuckDB mirrors the identical
    integer arithmetic, so the operator is value-oracle-able.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in 1..12, got {precision}")
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    X = F.least(
        F.greatest(
            F.floor((lon + 180.0) / 360.0 * float(1 << nlon)).cast("long"),
            F.lit(0),
        ),
        F.lit((1 << nlon) - 1),
    )
    Y = F.least(
        F.greatest(
            F.floor((lat + 90.0) / 180.0 * float(1 << nlat)).cast("long"),
            F.lit(0),
        ),
        F.lit((1 << nlat) - 1),
    )
    # from the LSB, lon bits sit at odd positions when the bit count
    # is even and at even positions when it is odd (MSB is always lon)
    sx, sy = _morton_spread(X), _morton_spread(Y)
    if bits % 2 == 0:
        acc = F.shiftleft(sx, 1).bitwiseOR(sy)
    else:
        acc = sx.bitwiseOR(F.shiftleft(sy, 1))
    code = F.lower(
        F.lpad(F.conv(acc.cast("string"), 10, 32), precision, "0")
    )
    return F.when(
        lon.isNotNull() & lat.isNotNull(),
        F.translate(code, _CONV32.lower(), GEOHASH_BASE32),
    )
