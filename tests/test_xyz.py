"""Web-Mercator z/x/y tiling + quadkeys (geo/xyz.py).

Pins the slippy-map convention (the scheme Mapbox slices uploads into —
`MapBoxUpdateRouteBuilder.java:109-122` hands that slicing to the
service; here it is an engine operator), the Bing quadkey encoding, the
pole/antimeridian clamps, and the pyramid shift identity.
"""

import math

import pytest
from pyspark.sql import functions as F

from asag_spark.geo.xyz import (
    MAX_MERCATOR_LAT, assign_xyz, mvt_coords, quadkey, rasterize_xyz,
    tile_pyramid, tile_x, tile_y, vectorize_xyz,
)


def _py_xyz(lon, lat, z):
    """Independent reference implementation (textbook formulas)."""
    n = 1 << z
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    lat = min(max(lat, -MAX_MERCATOR_LAT), MAX_MERCATOR_LAT)
    lr = math.radians(lat)
    merc = (1.0 - math.asinh(math.tan(lr)) / math.pi) / 2.0
    y = min(max(int(math.floor(merc * n)), 0), n - 1)
    return x, y


def _py_quadkey(x, y, z):
    return "".join(
        str(((x >> (i - 1)) & 1) + 2 * ((y >> (i - 1)) & 1))
        for i in range(z, 0, -1)
    )


COORDS = [
    (0.1, 0.1), (-0.1, -0.1), (10.757933, 59.911491),  # Oslo S
    (-122.3321, 47.6062), (139.6917, 35.6895), (-43.1729, -22.9068),
    (179.999, 84.9), (-180.0, -85.05), (180.0, 89.0), (0.0, 0.0),
]


def test_xyz_matches_reference_formula(spark):
    rows = [(float(lo), float(la)) for lo, la in COORDS]
    df = spark.createDataFrame(rows, "lon double, lat double")
    for z in (1, 7, 12, 16):
        got = (
            df.select(
                "lon", "lat",
                tile_x(F.col("lon"), z).alias("x"),
                tile_y(F.col("lat"), z).alias("y"),
            )
            .collect()
        )
        for r in got:
            ex, ey = _py_xyz(r.lon, r.lat, z)
            assert (r.x, r.y) == (ex, ey), (r.lon, r.lat, z)


def test_quadkey_bing_example(spark):
    # canonical example from the Bing tile-system spec: (3, 5, z=3) → "213"
    df = spark.createDataFrame([(3, 5)], "x int, y int")
    [row] = df.select(quadkey(F.col("x"), F.col("y"), 3).alias("qk")).collect()
    assert row.qk == "213"
    assert _py_quadkey(3, 5, 3) == "213"


def test_quadkey_zoom_zero(spark):
    # the root tile's quadkey is the empty string, not null (Bing spec:
    # level-N key has N digits; level 0 → zero digits)
    df = spark.createDataFrame([(0, 0), (None, None)], "x int, y int")
    rows = df.select(quadkey(F.col("x"), F.col("y"), 0).alias("qk")).collect()
    assert rows[0].qk == ""
    assert rows[1].qk is None  # null tile id still propagates at zoom 0


def test_clamps(spark):
    df = spark.createDataFrame(
        [(200.0, 89.9), (-200.0, -89.9)], "lon double, lat double"
    )
    out = df.select(
        tile_x(F.col("lon"), 5).alias("x"), tile_y(F.col("lat"), 5).alias("y")
    ).collect()
    assert (out[0].x, out[0].y) == (31, 0)   # east/north overflow → edge tile
    assert (out[1].x, out[1].y) == (0, 31)   # west/south overflow → edge tile


def test_pyramid_shift_and_quadkey_prefix(spark):
    feats = spark.createDataFrame(
        [(f"f{i}", lo, la) for i, (lo, la) in enumerate(COORDS)],
        "feature_id string, lon double, lat double",
    )
    out = assign_xyz(feats, zooms=(7, 12)).collect()
    for r in out:
        # parent tile is an exact integer shift — no re-projection
        assert r.x7 == r.x12 >> 5 and r.y7 == r.y12 >> 5
        # quadkey prefix at length 7 IS the zoom-7 quadkey
        assert r.qk12[:7] == r.qk7
        assert len(r.qk12) == 12
        assert r.qk12 == _py_quadkey(r.x12, r.y12, 12)


def test_mvt_coords_consistent_with_tile(spark):
    """Quantized local coords always land inside the assigned tile and
    match an independent reference computation."""
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in COORDS], "lon double, lat double"
    )
    tx, ty, lx, ly = mvt_coords(F.col("lon"), F.col("lat"), 9, 4096)
    out = df.select(
        "lon", "lat", tx.alias("tx"), ty.alias("ty"),
        lx.alias("lx"), ly.alias("ly"),
    ).collect()
    for r in out:
        ex, ey = _py_xyz(r.lon, r.lat, 9)
        assert (r.tx, r.ty) == (ex, ey)
        assert 0 <= r.lx < 4096 and 0 <= r.ly < 4096
        n = 1 << 9
        fx = (r.lon + 180.0) / 360.0 * n
        want_lx = min(max(int(math.floor((fx - ex) * 4096.0)), 0), 4095)
        assert r.lx == want_lx


def test_mvt_far_edge_clamps_into_last_cell(spark):
    df = spark.createDataFrame([(180.0, 0.0)], "lon double, lat double")
    tx, ty, lx, ly = mvt_coords(F.col("lon"), F.col("lat"), 3, 4096)
    [r] = df.select(tx.alias("tx"), lx.alias("lx")).collect()
    assert r.tx == 7 and r.lx == 4095  # antimeridian → last tile, last cell


def test_rasterize_xyz_counts(spark):
    # two points in the same pixel + one in a different tile
    df = spark.createDataFrame(
        [(10.0, 60.0), (10.0000001, 60.0000001), (-120.0, -30.0)],
        "lon double, lat double",
    )
    out = rasterize_xyz(df, zoom=5, extent=16).collect()
    assert sum(r.n for r in out) == 3
    assert {r.n for r in out} == {2, 1}
    for r in out:
        assert 0 <= r.px < 16 and 0 <= r.py < 16


def test_vectorize_xyz_roundtrip(spark):
    """Each vectorized pixel's center re-rasterizes into the same
    (tile, pixel) — rasterize∘vectorize is the identity on cells."""
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in COORDS], "lon double, lat double"
    )
    raster = rasterize_xyz(df, zoom=6, extent=16)
    vec = vectorize_xyz(raster, zoom=6, extent=16)
    back = rasterize_xyz(vec.select("lon", "lat"), zoom=6, extent=16)
    orig = {(r.x, r.y, r.px, r.py) for r in raster.collect()}
    again = {(r.x, r.y, r.px, r.py) for r in back.collect()}
    assert orig == again
    for r in vec.collect():
        assert r.lon_min < r.lon < r.lon_max
        assert r.lat_min < r.lat < r.lat_max
        assert r.geom_wkt.startswith("POLYGON((")


def test_tile_pyramid_conservation(spark):
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in COORDS], "lon double, lat double"
    )
    pyr = tile_pyramid(df, base_zoom=8, min_zoom=3).collect()
    by_zoom = {}
    for r in pyr:
        by_zoom.setdefault(r.zoom, []).append(r)
    assert set(by_zoom) == set(range(3, 9))
    for z, rows in by_zoom.items():
        assert sum(r.n for r in rows) == len(COORDS)  # counts conserved
    # every child tile nests in a parent with >= its count
    for z in range(4, 9):
        parents = {(r.x, r.y): r.n for r in by_zoom[z - 1]}
        for r in by_zoom[z]:
            assert parents[(r.x >> 1, r.y >> 1)] >= r.n


def test_write_clustered_prunes_tile_scans(spark, tmp_path):
    """Quadkey-clustered layout: the startswith filter reaches the
    parquet scan as a pushed filter, and reading a tile prefix returns
    exactly the spatially-matching rows."""
    from asag_spark.sources import write_clustered

    feats = spark.createDataFrame(
        [(f"f{i}", lo, la) for i, (lo, la) in enumerate(COORDS)],
        "feature_id string, lon double, lat double",
    )
    df = assign_xyz(feats, zooms=(12,)).filter(F.col("qk12").isNotNull())
    path = str(tmp_path / "clustered")
    write_clustered(df, path, key="qk12", partitions=4)
    back = spark.read.parquet(path)
    prefix = df.select("qk12").first().qk12[:7]
    q = back.filter(F.col("qk12").startswith(prefix))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith(qk12" in plan.replace(" ", "") or "PushedFilters: [StringStartsWith(qk12" in plan
    want = {r.feature_id for r in df.collect() if r.qk12.startswith(prefix)}
    assert {r.feature_id for r in q.collect()} == want


def _winding_inside(lon, lat, ring):
    """Independent reference: nonzero winding number (vs the engine's
    even-odd crossing count — equivalent for simple rings)."""
    wn = 0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        cross = (x2 - x1) * (lat - y1) - (lon - x1) * (y2 - y1)
        if y1 <= lat:
            if y2 > lat and cross > 0:
                wn += 1
        elif y2 <= lat and cross < 0:
            wn -= 1
    return wn != 0


def test_rasterize_polygons_matches_independent_winding(spark):
    from asag_spark.datagen import fixture_zones
    from asag_spark.geo.tiles import rasterize_polygons_xyz
    from asag_spark.geo.wkt import parse_polygon
    from asag_spark.geo.xyz import np_merc_fxy, np_pixel_center_lonlat
    import numpy as np

    zoom, extent = 10, 16
    n = 1 << zoom
    zones = fixture_zones(spark)
    got = {
        (r.zone_id, r.x, r.y): r.n_pixels
        for r in rasterize_polygons_xyz(zones, zoom=zoom, extent=extent).collect()
    }
    expected = {}
    for row in zones.collect():
        ring = parse_polygon(row.geom_wkt)
        pts = [(float(a), float(b)) for a, b in ring]
        lons, lats = [p[0] for p in pts], [p[1] for p in pts]
        fx, fy = np_merc_fxy(
            np.array([min(lons), max(lons)]),
            np.array([max(lats), min(lats)]), zoom,
        )
        for x in range(int(fx[0]), min(int(fx[1]), n - 1) + 1):
            for y in range(int(fy[0]), min(int(fy[1]), n - 1) + 1):
                cnt = 0
                for px in range(extent):
                    for py in range(extent):
                        lon, lat = np_pixel_center_lonlat(
                            float(x), float(y),
                            np.float64(px), np.float64(py), zoom, extent,
                        )
                        if _winding_inside(float(lon), float(lat), pts):
                            cnt += 1
                if cnt:
                    expected[(row.zone_id, x, y)] = cnt
    assert got == expected and len(got) == 11


def test_null_propagation(spark):
    feats = spark.createDataFrame(
        [("poly", None, None), ("pt", 10.0, 60.0)],
        "feature_id string, lon double, lat double",
    )
    rows = {r.feature_id: r for r in assign_xyz(feats, zooms=(7,)).collect()}
    assert rows["poly"].x7 is None and rows["poly"].qk7 is None
    assert rows["pt"].x7 is not None and len(rows["pt"].qk7) == 7


def test_clip_ring_area_partition_property():
    """A grid clip PARTITIONS a simple ring: the shoelace areas of the
    per-tile Sutherland-Hodgman clips must sum exactly (to float
    round-off) to the ring's own area, for convex AND non-convex
    subjects — the zero-width bridge edges S-H introduces on re-entry
    carry no area. Also: every clipped vertex lies inside its window."""
    import numpy as np

    from asag_spark.geo.xyz import clip_ring

    def shoelace(fx, fy):
        return 0.5 * float(
            np.dot(fx, np.roll(fy, -1)) - np.dot(fy, np.roll(fx, -1))
        )

    rng = np.random.default_rng(11)
    for trial in range(20):
        # star polygon around (2.5, 2.5): non-convex for most draws
        k = int(rng.integers(5, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 2.4, k)
        fx = 2.5 + rad * np.cos(ang)
        fy = 2.5 + rad * np.sin(ang)
        if shoelace(fx, fy) < 0:  # normalize orientation
            fx, fy = fx[::-1], fy[::-1]
        total = 0.0
        for tx in range(5):
            for ty in range(5):
                cfx, cfy = clip_ring(fx, fy, tx, ty, tx + 1.0, ty + 1.0)
                if not len(cfx):
                    continue
                assert (cfx >= tx - 1e-9).all() and (cfx <= tx + 1 + 1e-9).all()
                assert (cfy >= ty - 1e-9).all() and (cfy <= ty + 1 + 1e-9).all()
                total += shoelace(cfx, cfy)
        assert abs(total - shoelace(fx, fy)) < 1e-9, trial
    # fully-outside window → empty
    assert clip_ring(fx, fy, 50.0, 50.0, 51.0, 51.0)[0].size == 0


def test_clip_polygons_to_tiles_engine(spark):
    """Engine pass over the fixture zones at zoom 9: rows match the
    pinned golden exactly at any parallelism; extent-local coords stay
    in [0, 4096]; shared tile edges of adjacent clips land exactly on
    the 0/4096 boundary (the twin Bolaerene polygons are identical)."""
    from asag_spark.datagen import fixture_zones
    from asag_spark.geo.xyz import clip_polygons_to_tiles

    zones = fixture_zones(spark).withColumnRenamed("zone_id", "feature_id")
    got = {
        (r["feature_id"], r["x"], r["y"], r["mvt_ring"])
        for r in clip_polygons_to_tiles(zones, zoom=9).collect()
    }
    got17 = {
        (r["feature_id"], r["x"], r["y"], r["mvt_ring"])
        for r in clip_polygons_to_tiles(zones.repartition(7), zoom=9).collect()
    }
    assert got == got17 and len(got) == 11
    for _, _, _, ring in got:
        for pair in ring.split(" "):
            px, py = map(int, pair.split(","))
            assert 0 <= px <= 4096 and 0 <= py <= 4096
    t729 = {(x, y, ring) for f, x, y, ring in got
            if f == "VKT:TariffZone:729"}
    t730 = {(x, y, ring) for f, x, y, ring in got
            if f == "VKT:TariffZone:730"}
    assert t729 == t730 and len(t729) == 4


def test_smooth_cell_counts_focal_mean(spark):
    """Focal mean on a constructed raster: a single occupied cell
    scatters 1/7 of its count to each of its 7 disk cells; a pair of
    adjacent cells overlaps correctly; brute-force gather parity on a
    random raster."""
    import numpy as np

    from asag_spark.geo.hexgrid import grid_disk
    from asag_spark.geo.tiles import smooth_cell_counts

    one = spark.createDataFrame([("h7_0_0", 7)], "cell string, n long")
    got = {r["cell"]: r["smoothed"]
           for r in smooth_cell_counts(one).collect()}
    assert got == {f"h7_{q}_{r}": 1.0 for q, r in grid_disk(0, 0, 1)}

    rng = np.random.default_rng(3)
    cells = {(int(q), int(r)): int(n) for q, r, n in zip(
        rng.integers(-5, 6, 60), rng.integers(-5, 6, 60),
        rng.integers(1, 100, 60),
    )}
    df = spark.createDataFrame(
        [(f"h8_{q}_{r}", n) for (q, r), n in cells.items()],
        "cell string, n long",
    )
    got = {r["cell"]: r["smoothed"]
           for r in smooth_cell_counts(df).collect()}
    # brute-force GATHER: smoothed(c) = sum of disk counts / 7
    expect = {}
    targets = {t for qr in cells for t in grid_disk(*qr, 1)}
    for tq, tr in targets:
        s = sum(cells.get((nq, nr), 0) for nq, nr in grid_disk(tq, tr, 1))
        expect[f"h8_{tq}_{tr}"] = round(s / 7.0, 6)
    assert got == expect


def test_compact_tiles_quartets_and_roundtrip(spark):
    from asag_spark.geo.xyz import compact_tiles

    # z2 grid: the full NW z1-quadrant (tiles 0..1 x 0..1), a complete
    # quartet at (2..3, 0..1) -> two z1 parents which together form an
    # INCOMPLETE z0 quartet (only 2 of 4 children), plus one isolated
    # z2 tile
    base = [(x, y) for x in range(4) for y in range(2)] + [(0, 3)]
    df = spark.createDataFrame(base, "x int, y int")
    got = sorted((r.z, r.x, r.y)
                 for r in compact_tiles(df, zoom=2, min_zoom=0).collect())
    assert got == [(1, 0, 0), (1, 1, 0), (2, 0, 3)]

    # full z2 coverage compacts to the single root tile
    full = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    assert [(r.z, r.x, r.y) for r in
            compact_tiles(full, zoom=2, min_zoom=0).collect()] == [(0, 0, 0)]

    # round-trip: expanding every output tile back to z2 reproduces the
    # input set exactly (same cover), and no two output tiles overlap
    out = compact_tiles(df, zoom=2, min_zoom=0).collect()
    expanded = set()
    for r in out:
        shift = 2 - r.z
        for dx in range(1 << shift):
            for dy in range(1 << shift):
                cell = ((r.x << shift) + dx, (r.y << shift) + dy)
                assert cell not in expanded, "overlapping output tiles"
                expanded.add(cell)
    assert expanded == set(base)

    # duplicates in the input must not fabricate complete quartets
    dup = spark.createDataFrame(
        [(0, 0), (0, 0), (0, 1), (1, 0)], "x int, y int"
    )
    got_dup = sorted((r.z, r.x, r.y)
                     for r in compact_tiles(dup, zoom=2, min_zoom=0).collect())
    assert got_dup == [(2, 0, 0), (2, 0, 1), (2, 1, 0)]


def _geohash_ref(lon, lat, precision):
    """Textbook bisection reference (independent of the closed form)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, code, is_lon = [], [], True
    while len(bits) < 5 * precision:
        if is_lon:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        is_lon = not is_lon
    for g in range(precision):
        idx = 0
        for b in bits[5 * g:5 * g + 5]:
            idx = idx * 2 + b
        code.append(b32[idx])
    return "".join(code)


def test_geohash_known_vectors_and_reference(spark):
    import random

    from asag_spark.geo.xyz import geohash

    rng = random.Random(42)
    pts = [(-5.603, 42.605), (10.40744, 57.64911), (0.0, 0.0)] + [
        (rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(40)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(
        "lon", "lat",
        geohash(F.col("lon"), F.col("lat"), 5).alias("g5"),
        geohash(F.col("lon"), F.col("lat"), 7).alias("g7"),
        geohash(F.col("lon"), F.col("lat"), 12).alias("g12"),
    ).collect()
    for r in out:
        assert r["g5"] == _geohash_ref(r["lon"], r["lat"], 5)
        assert r["g7"] == _geohash_ref(r["lon"], r["lat"], 7)
        assert r["g12"] == _geohash_ref(r["lon"], r["lat"], 12)
    by5 = {(round(r["lon"], 5), round(r["lat"], 5)): r["g5"] for r in out}
    # canonical public vectors
    assert by5[(-5.603, 42.605)] == "ezs42"
    assert by5[(10.40744, 57.64911)] == "u4pru"
    # prefix property: higher precision extends, never changes, the code
    for r in out:
        assert r["g12"].startswith(r["g7"]) and r["g7"].startswith(r["g5"])


def test_geohash_codegen_compiles(spark, tmp_path):
    """The Morton closed form must stay inside whole-stage codegen —
    the per-bit chain compiled 660 extract terms and janino fell back
    to interpreted mode for the entire stage."""
    from asag_spark.geo.xyz import geohash

    p = str(tmp_path / "pts")
    spark.range(100).select(
        (F.col("id") * 3.1 % 360 - 180).alias("lon"),
        (F.col("id") * 1.7 % 180 - 90).alias("lat"),
    ).write.parquet(p)
    df = spark.read.parquet(p).select(
        geohash(F.col("lon"), F.col("lat"), 11).alias("g")
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" marks whole-stage-codegen stages in the plan string; the
    # interpreted fallback renders a bare "Project"
    assert "*(1) Project" in plan


def test_compact_tiles_driver_distributed_parity(spark):
    """The size-gated driver-side compaction and the distributed
    per-level chain produce the identical minimal cover (same rule,
    two executions); empty input yields an empty typed frame."""
    import random

    from asag_spark.geo.xyz import compact_tiles

    rng = random.Random(7)
    base = {(rng.randrange(16), rng.randrange(16)) for _ in range(150)}
    base |= {(x, y) for x in range(4) for y in range(4)}  # a full block
    df = spark.createDataFrame(sorted(base), "x int, y int")
    fast = sorted((r.z, r.x, r.y)
                  for r in compact_tiles(df, zoom=4, min_zoom=0).collect())
    dist = sorted((r.z, r.x, r.y)
                  for r in compact_tiles(df, zoom=4, min_zoom=0,
                                         collect_max_tiles=0).collect())
    assert fast == dist and len(fast) > 0
    empty = compact_tiles(
        spark.createDataFrame([], "x int, y int"), zoom=3
    )
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == ["z", "x", "y"]
