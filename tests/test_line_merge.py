"""Standalone line_merge kernel (getCospatialityOfLinestrings.js:169-267)
vs scalar expectations, and the multi-part cospatiality wrapper."""

import numpy as np

from gtfs_conflation_pipeline_spark import kernels as K

KM_LON = 1.0 / 111.19492664455873  # ~1 km of longitude at the equator


def _seg(start_km, end_km, n=5):
    return (
        np.linspace(start_km * KM_LON, end_km * KM_LON, n),
        np.zeros(n),
    )


def test_exact_endpoint_chain_merges_to_one_line():
    """Three parts sharing exact endpoints stitch into one polyline in
    chain order; the stitch is SINGLE-PASS (the reference reduce never
    re-scans, :195-237), so a permutation that orphans the middle part
    leaves two lines — parity with the reference, not a fixpoint."""
    a = _seg(0.0, 1.0)
    b = _seg(1.0, 2.0)  # starts exactly at a's end
    c = _seg(2.0, 3.0)
    out = K.line_merge([a, b, c])
    assert len(out) == 1
    xs, ys = out[0]
    assert xs[0] == 0.0 and np.isclose(xs[-1], 3.0 * KM_LON)
    # shared joint vertices are not duplicated
    assert xs.size == 5 + 4 + 4
    # single-pass parity: [a, c, b] -> c placed before a+b grows to meet it
    assert len(K.line_merge([a, c, b])) == 2


def test_prepend_branch():
    """cur end == other start prepends (reference :212-216)."""
    b = _seg(1.0, 2.0)
    a = _seg(0.0, 1.0)
    out = K.line_merge([b, a])  # a's END hits b's START
    assert len(out) == 1
    assert out[0][0][0] == 0.0


def test_disjoint_parts_stay_separate_and_sort_ascending():
    long = _seg(0.0, 2.0)
    short = _seg(5.0, 5.5)
    out = K.line_merge([long, short])
    assert len(out) == 2
    # sorted by length ascending (:241)
    assert K.polyline_length_km(*out[0]) < K.polyline_length_km(*out[1])


def test_tolerance_stitches_near_endpoints():
    """A 1 m endpoint gap stitches at the 2 m tolerance and not at 0."""
    a = _seg(0.0, 1.0)
    b = _seg(1.001, 2.0)  # 1 m gap
    assert len(K.line_merge([a, b])) == 2
    assert len(K.line_merge([a, b], tolerance_km=0.002)) == 1


def test_degenerate_parts_dropped_and_redundant_coords_removed():
    xs = np.array([0.0, 0.0, 1.0 * KM_LON, 1.0 * KM_LON, 2.0 * KM_LON])
    ys = np.zeros(5)
    single = (np.array([9.0]), np.array([0.0]))  # <2 coords: dropped
    out = K.line_merge([(xs, ys), single])
    assert len(out) == 1
    assert out[0][0].size == 3  # consecutive duplicates removed


def test_subsumption_filter_drops_line_within_tolerance_of_longer():
    """With tolerance, a short line lying on a longer one is dropped
    (:241-260); at tolerance 0 both survive."""
    long = _seg(0.0, 3.0, n=31)
    dup = (
        np.linspace(1.0 * KM_LON, 1.4 * KM_LON, 5),
        np.full(5, 0.000001),  # ~0.1 m off the long line
    )
    assert len(K.line_merge([long, dup])) == 2
    out = K.line_merge([long, dup], tolerance_km=0.002)
    assert len(out) == 1
    assert np.isclose(K.polyline_length_km(*out[0]), 3.0, atol=0.01)


def test_multipart_cospatiality_equals_single_part_after_stitch():
    """A two-part A stitching into one line must report the same overlap
    intervals as the pre-stitched single-part kernel."""
    a1 = _seg(0.0, 1.0, n=11)
    a2 = _seg(1.0, 2.0, n=11)
    a_full = _seg(0.0, 2.0, n=21)
    b = _seg(0.5, 1.5, n=11)
    multi = K.cospatiality_two_sided_multi([a1, a2], [b])
    single = K.cospatiality_two_sided(a_full[0], a_full[1], b[0], b[1])
    assert multi is not None and single is not None
    for k in ("a_start_km", "a_end_km", "b_start_km", "b_end_km"):
        assert abs(multi[k] - single[k]) < 0.02, k


def test_multipart_cospatiality_picks_max_overlap_pair():
    """Disjoint A parts: the wrapper reports the pair with the larger
    overlap (the far part overlaps B for 1 km, the near part not at all)."""
    a1 = _seg(0.0, 0.3, n=5)
    a2 = _seg(5.0, 6.5, n=11)
    b = _seg(5.2, 6.2, n=11)
    c = K.cospatiality_two_sided_multi([a1, a2], [b])
    assert c is not None
    assert c["intxn_a_km"] > 0.5


def test_multipart_short_merged_parts_dropped():
    """Merged parts under the 2 m cutoff are dropped before cospatiality
    (geometryToGeoJson removeShortSegments, :300-305)."""
    tiny = _seg(0.0, 0.001, n=3)  # 1 m
    b = _seg(0.0, 1.0, n=11)
    assert K.cospatiality_two_sided_multi([tiny], [b]) is None
