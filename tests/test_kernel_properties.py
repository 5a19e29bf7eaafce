"""Property-based kernel tests (hypothesis): invariants that must hold for
ANY polyline/point inputs, not just the fixture's."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gtfs_conflation_pipeline_spark import kernels as K

# small NYS-like coordinate boxes keep the equirectangular approximations valid
lon = st.floats(min_value=-74.5, max_value=-73.5, allow_nan=False)
lat = st.floats(min_value=41.8, max_value=42.8, allow_nan=False)


@st.composite
def polyline(draw, min_pts=2, max_pts=30):
    n = draw(st.integers(min_pts, max_pts))
    x0 = draw(lon)
    y0 = draw(lat)
    # bounded random walk: steps <= ~100 m so lines stay local
    dxs = draw(st.lists(st.floats(-1e-3, 1e-3), min_size=n - 1, max_size=n - 1))
    dys = draw(st.lists(st.floats(-1e-3, 1e-3), min_size=n - 1, max_size=n - 1))
    xs = np.concatenate([[x0], x0 + np.cumsum(dxs)])
    ys = np.concatenate([[y0], y0 + np.cumsum(dys)])
    return xs, ys


@given(polyline())
@settings(max_examples=60, deadline=None)
def test_slice_conserves_length(line):
    xs, ys = line
    total = K.polyline_length_km(xs, ys)
    mid = total * 0.37
    ax, ay = K.line_slice_along(xs, ys, 0.0, mid)
    bx, by = K.line_slice_along(xs, ys, mid, total)
    la = K.polyline_length_km(ax, ay)
    lb = K.polyline_length_km(bx, by)
    assert la + lb <= total * (1 + 1e-6) + 1e-12
    assert abs((la + lb) - total) <= max(total * 1e-3, 1e-9)
    if total > 0:
        # adjoining slices share the cut coordinate
        assert abs(ax[-1] - bx[0]) < 1e-12
        assert abs(ay[-1] - by[0]) < 1e-12


@given(polyline(), st.floats(-0.01, 0.01), st.floats(-0.01, 0.01))
@settings(max_examples=60, deadline=None)
def test_snap_bounds(line, dx, dy):
    # point constrained near the line — the kernel's documented domain
    # (corridor-scale distances; equirect-vs-haversine error grows with km)
    xs, ys = line
    px, py = xs[0] + dx, ys[0] + dy
    total = K.polyline_length_km(xs, ys)
    seg, t, along, dev, sx, sy = K.snap_points_to_polyline([px], [py], xs, ys)
    assert 0.0 <= t[0] <= 1.0
    assert -1e-9 <= along[0] <= total + 1e-9
    # deviation never exceeds distance to ANY vertex (projection optimality
    # within the chosen segment is local; global bound vs vertices holds)
    d_verts = K.haversine_km(np.full(xs.size, px), np.full(ys.size, py), xs, ys)
    assert dev[0] <= d_verts.min() * (1 + 1e-4) + 1e-9
    # snapped point lies within the line's bbox (convexity of segments)
    assert xs.min() - 1e-9 <= sx[0] <= xs.max() + 1e-9
    assert ys.min() - 1e-9 <= sy[0] <= ys.max() + 1e-9


@given(polyline(min_pts=3))
@settings(max_examples=40, deadline=None)
def test_resample_preserves_endpoints_and_length(line):
    xs, ys = line
    rx, ry = K.resample_polyline(xs, ys, 25)
    assert rx[0] == xs[0] and ry[0] == ys[0]
    assert rx[-1] == xs[-1] and ry[-1] == ys[-1]
    # resampling cannot lengthen a curve
    assert K.polyline_length_km(rx, ry) <= K.polyline_length_km(xs, ys) * (1 + 1e-9)


@given(polyline(), st.floats(-0.05, 0.05), st.floats(-0.05, 0.05))
@settings(max_examples=40, deadline=None)
def test_frechet_at_least_endpoint_gap(a, dx, dy):
    # compare curves NEAR each other (corridor-scale domain): at tens of km
    # the equirect snap deviation and haversine Frechet diverge by >1e-3
    ax, ay = a
    bx, by = ax + dx, ay + dy
    fr = K.discrete_frechet_km(ax, ay, bx, by)
    start_gap = float(K.haversine_km(ax[0], ay[0], bx[0], by[0]))
    end_gap = float(K.haversine_km(ax[-1], ay[-1], bx[-1], by[-1]))
    assert fr >= max(start_gap, end_gap) - 1e-12
    # and Frechet >= Hausdorff-from-A (coupling dominates nearest-point;
    # 1e-3 slack: dev is equirect-planar, frechet is haversine)
    _, _, _, dev, _, _ = K.snap_points_to_polyline(ax, ay, bx, by)
    assert fr >= dev.max() * (1 - 1e-3) - 1e-9


@given(polyline(), st.integers(0, 2))
@settings(max_examples=40, deadline=None)
def test_cover_cells_contain_vertex_cells(line, ring):
    xs, ys = line
    cover = set(K.cell_cover_of_points(xs, ys, 0.002, ring=ring))
    vertex_cells = set(int(c) for c in K.cell_id(xs, ys, 0.002))
    assert vertex_cells <= cover
    if ring > 0:
        assert len(cover) >= len(vertex_cells)


@given(lon, lat, st.integers(5, 15))
@settings(max_examples=60, deadline=None)
def test_tile_contains_point(plon, plat, zoom):
    xt, yt = K.lonlat_to_tile(plon, plat, zoom)
    n = 2**zoom
    # invert the tile edges: the point's x must lie in [xt, xt+1) / n of lon span
    lo = xt / n * 360.0 - 180.0
    hi = (xt + 1) / n * 360.0 - 180.0
    assert lo - 1e-9 <= plon < hi + 1e-9


@given(st.integers(0, 2**40), st.integers(0, 2**40))
@settings(max_examples=100, deadline=None)
def test_morton_injective_in_range(ix, iy):
    ix &= (1 << 32) - 1
    iy &= (1 << 32) - 1
    c = int(K.morton64(np.array([ix]), np.array([iy]))[0])
    # decode by bit de-interleave
    dx = dy = 0
    for b in range(32):
        dx |= ((c >> (2 * b + 1)) & 1) << b
        dy |= ((c >> (2 * b)) & 1) << b
    assert (dx, dy) == (ix, iy)
