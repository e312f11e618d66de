"""Property-based tests (hypothesis) over the pure-numpy geo kernels.

The reference has no property tests (SURVEY.md §5); these pin the
invariants the distributed operators rely on — tile containment,
pyramid nesting, projection round-trips, measure invariances — without
a JVM, so they run in milliseconds and explore the input space instead
of fixed fixtures.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from asag_spark.geo.measures import ring_area_m2, ring_perimeter_m
from asag_spark.geo.xyz import MAX_MERCATOR_LAT, np_merc_fxy, np_pixel_center_lonlat

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
zooms = st.integers(min_value=0, max_value=16)


@given(lons, lats, zooms)
@settings(max_examples=300, deadline=None)
def test_tile_units_in_range(lon, lat, zoom):
    fx, fy = np_merc_fxy(np.array([lon]), np.array([lat]), zoom)
    n = 1 << zoom
    assert 0.0 <= fx[0] <= n
    assert -1e-9 <= fy[0] <= n + 1e-9  # clamped lat keeps fy finite


@given(lons, lats, zooms)
@settings(max_examples=300, deadline=None)
def test_pyramid_nesting(lon, lat, zoom):
    """The tile at zoom z, right-shifted, equals the tile at z-1."""
    if zoom == 0:
        return
    n_hi, n_lo = 1 << zoom, 1 << (zoom - 1)
    fx_hi, fy_hi = np_merc_fxy(np.array([lon]), np.array([lat]), zoom)
    fx_lo, fy_lo = np_merc_fxy(np.array([lon]), np.array([lat]), zoom - 1)
    x_hi = min(max(int(np.floor(fx_hi[0])), 0), n_hi - 1)
    y_hi = min(max(int(np.floor(fy_hi[0])), 0), n_hi - 1)
    x_lo = min(max(int(np.floor(fx_lo[0])), 0), n_lo - 1)
    y_lo = min(max(int(np.floor(fy_lo[0])), 0), n_lo - 1)
    assert (x_hi >> 1, y_hi >> 1) == (x_lo, y_lo)


@given(
    st.integers(min_value=0, max_value=31), st.integers(min_value=0, max_value=31),
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15),
)
@settings(max_examples=300, deadline=None)
def test_pixel_center_roundtrip(x, y, px, py):
    """A pixel's center re-projects into exactly that (tile, pixel)."""
    zoom, extent = 5, 16
    lon, lat = np_pixel_center_lonlat(
        float(x), float(y), np.float64(px), np.float64(py), zoom, extent
    )
    fx, fy = np_merc_fxy(np.array([float(lon)]), np.array([float(lat)]), zoom)
    assert int(np.floor(fx[0])) == x and int(np.floor(fy[0])) == y
    assert int(np.floor((fx[0] - x) * extent)) == px
    assert int(np.floor((fy[0] - y) * extent)) == py


_box = st.tuples(
    st.floats(min_value=-170.0, max_value=160.0, allow_nan=False),
    st.floats(min_value=-75.0, max_value=70.0, allow_nan=False),
    st.floats(min_value=0.01, max_value=8.0, allow_nan=False),
    st.floats(min_value=0.01, max_value=8.0, allow_nan=False),
)


def _ring(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
    )


@given(_box)
@settings(max_examples=200, deadline=None)
def test_area_matches_exact_spherical_box(box):
    x0, y0, w, h = box
    from asag_spark.geo.wkt import EARTH_RADIUS_M

    exact = (
        EARTH_RADIUS_M ** 2
        * math.radians(w)
        * (math.sin(math.radians(y0 + h)) - math.sin(math.radians(y0)))
    )
    got = ring_area_m2(_ring(x0, y0, w, h))
    assert abs(got - exact) <= max(1e-6 * exact, 1.0)


@given(_box, st.floats(min_value=-5.0, max_value=5.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_measures_longitude_translation_invariant(box, dlon):
    """Shifting a polygon east/west changes neither area nor perimeter
    (rotational symmetry of the sphere)."""
    x0, y0, w, h = box
    a1 = ring_area_m2(_ring(x0, y0, w, h))
    a2 = ring_area_m2(_ring(x0 + dlon, y0, w, h))
    p1 = ring_perimeter_m(_ring(x0, y0, w, h))
    p2 = ring_perimeter_m(_ring(x0 + dlon, y0, w, h))
    assert abs(a1 - a2) <= max(1e-9 * a1, 1e-3)
    assert abs(p1 - p2) <= max(1e-9 * p1, 1e-6)
