"""Unit tests: each numpy kernel vs an independent scalar oracle
(SURVEY.md §5.1). Adversarial inputs mirror the cases the reference guards
against: duplicate coords, loops, short segments."""

import math

import numpy as np
import pytest

from gtfs_conflation_pipeline_spark import kernels as K


def scalar_haversine(lon1, lat1, lon2, lat2):
    R = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * R * math.asin(math.sqrt(a))


def test_haversine_vs_scalar():
    rng = np.random.default_rng(42)
    pts = rng.uniform([-75, 41], [-73, 44], size=(50, 2))
    for (lon1, lat1), (lon2, lat2) in zip(pts[:-1], pts[1:]):
        got = float(K.haversine_km(lon1, lat1, lon2, lat2))
        assert got == pytest.approx(scalar_haversine(lon1, lat1, lon2, lat2), rel=1e-12)


def test_haversine_zero():
    assert float(K.haversine_km(-74.0, 42.0, -74.0, 42.0)) == 0.0


def test_polyline_length_degenerate():
    assert K.polyline_length_km([-74.0], [42.0]) == 0.0
    assert K.polyline_length_km([], []) == 0.0
    # duplicate consecutive coords contribute zero
    assert K.polyline_length_km([-74, -74, -74.001], [42, 42, 42]) == pytest.approx(
        scalar_haversine(-74, 42, -74.001, 42), rel=1e-9
    )


def test_bearing_cardinal():
    assert float(K.bearing_deg(-74, 42, -74, 43)) == pytest.approx(0.0, abs=1e-9)
    assert float(K.bearing_deg(-74, 42, -73, 42)) == pytest.approx(90.0, abs=0.5)
    assert float(K.bearing_deg(-74, 43, -74, 42)) == pytest.approx(180.0, abs=1e-9)


def test_round6():
    assert K.round6(1.23456789) == 1.234568
    assert np.array_equal(K.round6([1.0000004, 1.0000006]), [1.0, 1.000001])


def test_splitmix64_known_values():
    # reference values from the SplitMix64 spec (Vigna): seed 0 sequence
    assert int(K.splitmix64(np.uint64(0))) == 0xE220A8397B1DCDAF
    assert int(K.splitmix64(np.uint64(1))) == 0x910A2DEC89025CC1


def test_morton_roundtrip_order():
    # Morton preserves grid identity and is unique per cell
    ids = K.cell_id([-74.0, -74.0, -73.9999], [42.0, 42.1, 42.0], 0.01)
    assert ids[0] != ids[1]
    # -74.0 and -73.9999 fall in different 0.01-deg cells? -74.0 -> 10600, -73.9999 -> 10600.01 -> same cell
    assert ids[0] == ids[2]
    # same point, same id (deterministic)
    assert K.cell_id(-74.0, 42.0, 0.01) == ids[0]


def test_cell_cover_ring():
    c0 = K.cell_cover_of_points([-74.0], [42.0], 0.01, ring=0)
    c1 = K.cell_cover_of_points([-74.0], [42.0], 0.01, ring=1)
    assert len(c0) == 1
    assert len(c1) == 9
    assert set(c0).issubset(set(c1))


def test_geoprox_key_matches_reference_semantics():
    # independent re-derivation of getGeoProximityKey.js for one point
    lon, lat = -73.5, 42.25
    p_lon = format(round(abs(lon * 100000)), "b")
    p_lat = format(round(abs(lat * 100000)), "b")
    bits = ""
    for i, c in enumerate(p_lon):
        bits += c + (p_lat[i] if i < len(p_lat) else "0")
    expect = np.base_repr(int(bits, 2), 36).lower().rjust(11, "0")
    assert K.geoprox_key([lon, lon + 1], [lat, lat + 1]) <= expect  # min(start,end)
    assert K.geoprox_key([lon], [lat]) == expect


def test_tile_math_slippy_reference():
    # openstreetmap wiki example: zoom 17, lat=51.51202, lon=0.02435 -> x=65544, y=43582
    xt, yt = K.lonlat_to_tile(0.02435, 51.51202, 17)
    assert int(xt) == 65544
    assert int(yt) == 43582


def test_tile_key_packing_unique():
    k1 = K.tile_key(7, 1, 2)
    k2 = K.tile_key(7, 2, 1)
    k3 = K.tile_key(8, 1, 2)
    assert len({int(k1), int(k2), int(k3)}) == 3


def test_zoom_for_networklevel():
    # reference tippecanoe FILTER thresholds (createMBTilesNDGeoJSON:13-39):
    # nlev<1 admitted at all zooms, 1->3, 2->4, 3->10, 4->13, else max-zoom 14
    assert list(K.zoom_for_networklevel([0, 1, 2, 3, 4, 5, 6])) == [0, 3, 4, 10, 13, 14, 14]


def test_snap_point_simple():
    # vertical line; point to the east at same latitude as midpoint
    xs = np.array([-74.0, -74.0])
    ys = np.array([42.0, 42.01])
    seg, t, along, dev, sx, sy = K.snap_points_to_polyline([-73.999], [42.005], xs, ys)
    assert seg[0] == 0
    assert t[0] == pytest.approx(0.5, abs=0.01)
    assert along[0] == pytest.approx(K.polyline_length_km(xs, ys) / 2, rel=0.02)
    assert dev[0] == pytest.approx(scalar_haversine(-74, 42.005, -73.999, 42.005), rel=0.01)
    assert sx[0] == pytest.approx(-74.0, abs=1e-9)


def test_snap_clamps_to_endpoints():
    xs = np.array([-74.0, -74.0])
    ys = np.array([42.0, 42.01])
    _, t, along, _, _, _ = K.snap_points_to_polyline([-74.0], [41.9], xs, ys)
    assert t[0] == 0.0 and along[0] == 0.0
    _, t, along, _, _, _ = K.snap_points_to_polyline([-74.0], [42.1], xs, ys)
    assert t[0] == 1.0
    assert along[0] == pytest.approx(K.polyline_length_km(xs, ys), rel=1e-9)


def test_line_slice_along_roundtrip():
    xs = np.array([-74.0, -73.99, -73.98, -73.97])
    ys = np.array([42.0, 42.005, 42.0, 42.005])
    total = K.polyline_length_km(xs, ys)
    sx, sy = K.line_slice_along(xs, ys, 0.0, total)
    assert K.polyline_length_km(sx, sy) == pytest.approx(total, rel=1e-9)
    # half slice has half length
    hx, hy = K.line_slice_along(xs, ys, 0.0, total / 2)
    assert K.polyline_length_km(hx, hy) == pytest.approx(total / 2, rel=1e-4)
    # adjoining slices share the cut coordinate (connectivity invariant,
    # reference GtfsNetworkDAO/loaders/index.js:144-146)
    ax, ay = K.line_slice_along(xs, ys, total / 3, total)
    bx, by = K.line_slice_along(xs, ys, 0.0, total / 3)
    assert bx[-1] == pytest.approx(ax[0], abs=1e-12)
    assert by[-1] == pytest.approx(ay[0], abs=1e-12)


def test_fit_stops_monotone_simple():
    # straight west-east shape, stops in order -> greedy succeeds
    xs = np.linspace(-74.0, -73.9, 11)
    ys = np.full(11, 42.0)
    stop_x = np.array([-73.995, -73.955, -73.915])
    stop_y = np.array([42.0005, 41.9995, 42.0005])
    fit = K.fit_stops_to_path(stop_x, stop_y, xs, ys)
    assert np.all(np.diff(fit["dist_along_km"]) >= 0)
    assert np.all(fit["deviation_km"] < 0.12)


def test_fit_stops_needs_dp_on_loop():
    # loop shape: same coords visited twice; stops ordered along the loop.
    # Greedy snaps both stops to nearest geometric match (ambiguous);
    # DP must keep dist_along monotone.
    th = np.linspace(0, 2 * np.pi, 41)
    xs = -74.0 + 0.01 * np.cos(th)
    ys = 42.0 + 0.01 * np.sin(th)
    # stops at angle 0.1, pi, 2pi-0.1 of the loop
    sa = [0.1, np.pi, 2 * np.pi - 0.1]
    stop_x = -74.0 + 0.0101 * np.cos(sa)
    stop_y = 42.0 + 0.0101 * np.sin(sa)
    fit = K.fit_stops_to_path(stop_x, stop_y, xs, ys)
    assert np.all(np.diff(fit["dist_along_km"]) >= 0)


def test_rdp_keeps_corners():
    xs = np.array([-74.0, -73.995, -73.99, -73.99, -73.99])
    ys = np.array([42.0, 42.0, 42.0, 42.005, 42.01])
    mask = K.rdp_mask(xs, ys, 0.0001)
    assert mask[0] and mask[-1] and mask[2]  # corner kept
    assert not mask[1]  # collinear dropped


def test_resample_endpoints_and_count():
    xs = np.array([-74.0, -73.99, -73.98])
    ys = np.array([42.0, 42.0, 42.0])
    rx, ry = K.resample_polyline(xs, ys, 7)
    assert rx.size == 7
    assert rx[0] == xs[0] and rx[-1] == xs[-1]
    d = K.haversine_km(rx[:-1], ry[:-1], rx[1:], ry[1:])
    assert np.allclose(d, d[0], rtol=1e-6)


def test_frechet_identity_and_offset():
    xs = np.linspace(-74.0, -73.9, 20)
    ys = np.full(20, 42.0)
    assert K.discrete_frechet_km(xs, ys, xs, ys) == 0.0
    off = K.discrete_frechet_km(xs, ys, xs, ys + 0.001)
    assert off == pytest.approx(scalar_haversine(-74, 42, -74, 42.001), rel=0.01)


def test_hausdorff_symmetric():
    ax = np.linspace(-74.0, -73.9, 20)
    ay = np.full(20, 42.0)
    bx, by = ax.copy(), ay + 0.0005
    d1 = K.hausdorff_km(ax, ay, bx, by)
    d2 = K.hausdorff_km(bx, by, ax, ay)
    assert d1 == pytest.approx(d2, rel=1e-9)
    assert d1 == pytest.approx(scalar_haversine(0, 0, 0, 0.0005), rel=0.01)


def test_cospatiality_full_overlap():
    xs = np.linspace(-74.0, -73.98, 10)
    ys = np.full(10, 42.0)
    r = K.cospatiality_intervals(xs, ys, xs, ys + 1e-5)
    assert r is not None
    assert r["a_start_km"] == pytest.approx(0.0, abs=1e-6)
    assert r["intxn_len_km"] == pytest.approx(K.polyline_length_km(xs, ys), rel=0.01)


def test_cospatiality_partial_overlap():
    a_x = np.linspace(-74.0, -73.98, 21)  # ~1.65 km
    a_y = np.full(21, 42.0)
    # B covers only the second half of A
    b_x = np.linspace(-73.99, -73.98, 11)
    b_y = np.full(11, 42.0)
    r = K.cospatiality_intervals(a_x, a_y, b_x, b_y)
    assert r is not None
    half = K.polyline_length_km(a_x, a_y) / 2
    assert r["a_start_km"] == pytest.approx(half, rel=0.06)
    assert r["intxn_len_km"] == pytest.approx(half, rel=0.06)


def test_cospatiality_disjoint_and_short():
    a_x = np.linspace(-74.0, -73.99, 5)
    a_y = np.full(5, 42.0)
    b_x = a_x
    b_y = a_y + 0.01  # ~1.1 km away > radius
    assert K.cospatiality_intervals(a_x, a_y, b_x, b_y) is None
    # <2m segment cutoff (reference getCospatialityOfLinestrings.js:13)
    assert K.cospatiality_intervals([-74.0, -74.000001], [42.0, 42.0], b_x, b_y) is None


def test_bearing_split():
    # L-shaped line: 90-degree turn at index 2
    xs = np.array([-74.0, -73.999, -73.998, -73.998, -73.998])
    ys = np.array([42.0, 42.0, 42.0, 42.001, 42.002])
    idx = K.bearing_split_indices(xs, ys)
    assert list(idx) == [2]
    # smooth line: no splits
    assert K.bearing_split_indices(np.linspace(-74, -73.9, 20), np.full(20, 42.0)).size == 0


def test_pip_square():
    ring_x = np.array([-74.01, -73.99, -73.99, -74.01, -74.01])
    ring_y = np.array([41.99, 41.99, 42.01, 42.01, 41.99])
    inside = K.point_in_ring([-74.0, -74.02], [42.0, 42.0], ring_x, ring_y)
    assert inside[0] and not inside[1]


def test_buffer_ring_contains_line_excludes_far():
    xs = np.linspace(-74.0, -73.99, 10)
    ys = np.full(10, 42.0)
    rx, ry = K.buffer_ring(xs, ys, radius_km=0.005)
    inside = K.point_in_ring(xs[2:8], ys[2:8], rx, ry)
    assert inside.all()
    far = K.point_in_ring([-73.995], [42.001], rx, ry)  # ~110 m off-corridor
    assert not far[0]


def test_rmsd_meters():
    xs = np.array([-74.0, -73.99])
    ys = np.array([42.0, 42.0])
    px = np.array([-73.995])
    py = np.array([42.00009])  # ~10 m north
    assert K.rmsd_m(px, py, xs, ys) == pytest.approx(10.0, rel=0.05)


def test_corridor_match_batch_equals_scalar():
    """Cross-pair packed kernel == scalar kernel per pair: bit-identical
    intervals, <=1-ulp mean_dev (masked-mean accumulation), identical
    validity — over full-within, partial-within, none-within, short-line
    and sub-1m-intersection pairs."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    rng_base = -74.0
    pairs = []
    n = 21
    xs = np.round(np.linspace(rng_base, rng_base + 0.02, n), 6)
    ys = np.full(n, 42.0)
    # full within: B == A offset by 5e-6 deg (<1 m)
    pairs.append((xs, ys, xs + 5e-6, ys))
    # partial: B covers only the first half of A's corridor
    pairs.append((xs, ys, xs[: n // 2 + 1], ys[: n // 2 + 1]))
    # none: B far away
    pairs.append((xs, ys, xs + 0.01, ys))
    # offset at the corridor edge (irregular within-mask)
    pairs.append((xs, ys, xs, ys + 2.6e-4))
    # wiggly B
    pairs.append((xs, ys, xs, ys + 1e-5 * np.sin(np.arange(n))))

    # group pairs by B length for stacking
    from collections import defaultdict

    groups = defaultdict(list)
    for p in pairs:
        groups[len(p[2])].append(p)
    for _, grp in groups.items():
        AX = np.stack([p[0] for p in grp]); AY = np.stack([p[1] for p in grp])
        BX = np.stack([p[2] for p in grp]); BY = np.stack([p[3] for p in grp])
        ok, m = K.corridor_match_batch(AX, AY, BX, BY, radius_km=0.0003)
        for i, p in enumerate(grp):
            s = K.corridor_match(p[0], p[1], p[2], p[3], radius_km=0.0003)
            assert bool(ok[i]) == (s is not None)
            if s is None:
                continue
            for k in ("a_start_km", "a_end_km", "b_start_km", "b_end_km",
                      "intxn_len_km", "max_dev_km"):
                assert m[k][i] == s[k], k
            assert abs(m["mean_dev_km"][i] - s["mean_dev_km"]) <= 1e-15


def test_cell_cover_rows_equals_per_row():
    """Vectorized multi-row cover == per-row cell_cover_of_points as SETS,
    for ring 0 and 1, mixed row lengths, negative coords, empty rows."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    rng = np.random.default_rng(7)
    rows = [
        (np.array([-74.0, -73.99, -73.98]), np.array([42.0, 42.001, 42.0])),
        (np.array([0.0005]), np.array([-0.0005])),
        (rng.uniform(-75, -73, 40), rng.uniform(41, 43, 40)),
        (np.empty(0), np.empty(0)),
        (np.array([179.9995, -179.9995]), np.array([0.0, 0.0])),
        # domain edge: lat within cell_deg of -90 puts iy=0, where an
        # unbiased packed dgy=-1 would borrow from the ix half (round-3
        # ADVICE fix) — the ring-1 sets must still match per-row exactly
        (np.array([-74.0, -73.999]), np.array([-89.9995, -89.9993])),
    ]
    for ring in (0, 1, 2):
        got = K.cell_cover_rows([r[0] for r in rows], [r[1] for r in rows], 0.002, ring=ring)
        for (x, y), g in zip(rows, got):
            want = K.cell_cover_of_points(x, y, 0.002, ring=ring) if x.size else np.empty(0)
            assert set(g.tolist()) == set(np.asarray(want).tolist())


def test_cospatiality_batch_equals_scalar():
    """Packed two-sided cospatiality == scalar kernel per pair: identical
    validity and bit-identical intervals over overlap / partial / distant /
    backtracking / short-line pairs."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    n = 21
    xs = np.round(np.linspace(-74.0, -73.98, n), 6)
    ys = np.full(n, 42.0)
    back = np.concatenate([xs[: n - 10], xs[n - 12 : n - 12 + 10][::-1]])
    pairs = [
        (xs, ys, xs + 5e-6, ys),                       # near-identical
        (xs, ys, xs, ys + 2.6e-5),                     # offset inside radius
        (xs, ys, xs + 0.01, ys),                       # distant
        (xs, ys, back, ys),                            # B backtracks
        (xs, ys, xs, ys + 1e-5 * np.sin(np.arange(n))),  # wiggly
    ]
    AX = np.stack([p[0] for p in pairs]); AY = np.stack([p[1] for p in pairs])
    BX = np.stack([p[2] for p in pairs]); BY = np.stack([p[3] for p in pairs])
    ok, m = K.cospatiality_two_sided_batch(AX, AY, BX, BY, radius_km=0.005)
    for i, p in enumerate(pairs):
        s = K.cospatiality_two_sided(p[0], p[1], p[2], p[3], radius_km=0.005)
        assert bool(ok[i]) == (s is not None), i
        if s is None:
            continue
        for k in ("a_start_km", "a_end_km", "b_start_km", "b_end_km",
                  "intxn_a_km", "intxn_b_km"):
            assert m[k][i] == s[k], (i, k)


def test_score_batch_kernels_equal_scalar():
    """Batched Fréchet / Hausdorff / mean-dev == their scalar siblings
    (bit-identical DP, <=1-ulp means) on same-shape curve stacks."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    rng = np.random.default_rng(11)
    n, m, P = 17, 13, 6
    AX = -74.0 + np.cumsum(rng.uniform(1e-5, 1e-4, (P, n)), axis=1)
    AY = 42.0 + rng.uniform(-1e-4, 1e-4, (P, n))
    BX = -74.0 + np.cumsum(rng.uniform(1e-5, 1e-4, (P, m)), axis=1)
    BY = 42.0 + rng.uniform(-1e-4, 1e-4, (P, m))
    fr = K.discrete_frechet_km_batch(AX, AY, BX, BY)
    hd = K.hausdorff_km_batch(AX, AY, BX, BY)
    md = K.mean_dev_km_batch(AX, AY, BX, BY)
    for i in range(P):
        assert fr[i] == K.discrete_frechet_km(AX[i], AY[i], BX[i], BY[i]), i
        assert hd[i] == K.hausdorff_km(AX[i], AY[i], BX[i], BY[i]), i
        want = K.similarity_stats(AX[i], AY[i], BX[i], BY[i])["mean_km"]
        assert abs(md[i] - want) <= 1e-15, i


def _shape_similarity_port(ax, ay, bx, by, est=50, rotations=10,
                           restrict=0.1 * 3.141592653589793):
    """Independent scalar port of curve-matcher shapeSimilarity (plain
    python loops — the test oracle for kernels.shape_similarity)."""
    import math

    def rebalance(xs, ys, n):
        segs = [math.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])
                for i in range(len(xs) - 1)]
        total = sum(segs)
        if total == 0:
            return [xs[0]] * n, [ys[0]] * n
        cum = [0.0]
        for s in segs:
            cum.append(cum[-1] + s)
        out_x, out_y = [], []
        for k in range(n):
            d = total * k / (n - 1)
            i = max(j for j in range(len(cum)) if cum[j] <= d)
            i = min(i, len(segs) - 1)
            f = (d - cum[i]) / segs[i] if segs[i] > 0 else 0.0
            f = min(max(f, 0.0), 1.0)
            out_x.append(xs[i] + f * (xs[i + 1] - xs[i]))
            out_y.append(ys[i] + f * (ys[i + 1] - ys[i]))
        return out_x, out_y

    def normalize(xs, ys):
        xs, ys = rebalance(list(xs), list(ys), est)
        mx = sum(xs) / len(xs); my = sum(ys) / len(ys)
        xs = [x - mx for x in xs]; ys = [y - my for y in ys]
        scale = math.sqrt(sum(x * x + y * y for x, y in zip(xs, ys)) / len(xs))
        if scale > 0:
            xs = [x / scale for x in xs]; ys = [y / scale for y in ys]
        return xs, ys

    def frechet(ax, ay, bx, by):
        n, m = len(ax), len(bx)
        D = [[math.hypot(ax[i] - bx[j], ay[i] - by[j]) for j in range(m)]
             for i in range(n)]
        ca = [[0.0] * m for _ in range(n)]
        ca[0][0] = D[0][0]
        for j in range(1, m):
            ca[0][j] = max(ca[0][j - 1], D[0][j])
        for i in range(1, n):
            ca[i][0] = max(ca[i - 1][0], D[i][0])
            for j in range(1, m):
                ca[i][j] = max(min(ca[i - 1][j], ca[i - 1][j - 1], ca[i][j - 1]),
                               D[i][j])
        return ca[-1][-1]

    nax, nay = normalize(ax, ay)
    nbx, nby = normalize(bx, by)
    la = sum(math.hypot(nax[i + 1] - nax[i], nay[i + 1] - nay[i])
             for i in range(len(nax) - 1))
    lb = sum(math.hypot(nbx[i + 1] - nbx[i], nby[i + 1] - nby[i])
             for i in range(len(nbx) - 1))
    geo = math.sqrt(la * lb)
    num = sum(nby[i] * nax[i] - nbx[i] * nay[i] for i in range(est))
    den = sum(nbx[i] * nax[i] + nby[i] * nay[i] for i in range(est))
    tp = math.atan2(num, den)
    thetas = [0.0]
    if abs(tp) < restrict and tp != 0:
        thetas.append(tp)
    thetas += [-restrict + 2 * i * restrict / (rotations - 1)
               for i in range(rotations)]
    best = float("inf")
    for th in thetas:
        c, s = math.cos(th), math.sin(th)
        rx = [c * x - s * y for x, y in zip(nax, nay)]
        ry = [s * x + c * y for x, y in zip(nax, nay)]
        best = min(best, frechet(rx, ry, nbx, nby))
    if geo == 0:
        return 1.0 if best == 0 else 0.0
    return max(0.0, min(1.0, 1.0 - best / (geo / math.sqrt(2))))


def test_shape_similarity_matches_independent_port():
    """kernels.shape_similarity == an independent plain-python port of the
    published curve-matcher algorithm, on straight / curved / rotated /
    translated+scaled fixture curves."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    t = np.linspace(0, 1, 23)
    curves = [
        (t, np.zeros_like(t)),                        # straight
        (t, 0.2 * np.sin(3 * t)),                     # curved
        (t * 0.7 + 5.0, 0.2 * np.sin(3 * t) * 0.7),   # scaled+translated curved
        (t * np.cos(0.2) - 0.2 * np.sin(3 * t) * np.sin(0.2),
         t * np.sin(0.2) + 0.2 * np.sin(3 * t) * np.cos(0.2)),  # rotated 0.2rad
        (np.cos(t * 2), np.sin(t * 2)),               # arc
    ]
    for ax, ay in curves:
        for bx, by in curves:
            got = K.shape_similarity(ax, ay, bx, by)
            want = _shape_similarity_port(ax, ay, bx, by)
            assert got == pytest.approx(want, abs=1e-9), (got, want)


def test_shape_similarity_invariances():
    """Similarity semantics: identity = 1; translation+scale invariant;
    a rotation beyond the restriction window is penalized when the window
    is tight."""
    import numpy as np

    from gtfs_conflation_pipeline_spark import kernels as K

    t = np.linspace(0, 1, 30)
    ax, ay = t, 0.3 * np.sin(2.5 * t)
    assert K.shape_similarity(ax, ay, ax, ay) == 1.0
    assert K.shape_similarity(ax, ay, ax * 4 + 9, ay * 4 - 2) == pytest.approx(
        1.0, abs=1e-9
    )
    # rotate by 0.4*pi: outside the reference's 0.1*pi restriction window
    th = 0.4 * np.pi
    rx = ax * np.cos(th) - ay * np.sin(th)
    ry = ax * np.sin(th) + ay * np.cos(th)
    restricted = K.shape_similarity(ax, ay, rx, ry, restrict_rotation=0.1 * np.pi)
    free = K.shape_similarity(ax, ay, rx, ry, restrict_rotation=np.pi)
    assert free > restricted
    assert restricted < 0.95
