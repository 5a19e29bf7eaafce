"""Exact non-axiomatic combo selection (findNonAxiomaticPaths.js:64-242)
vs an INDEPENDENT scalar transcription of the reference's fork-and-constrain
reduce, on constructed overlap fixtures and randomized small-n sets."""

import numpy as np
import pytest

from gtfs_conflation_pipeline_spark import kernels as K
from gtfs_conflation_pipeline_spark.operators import graph_paths as GP

# ~1 km of longitude at the equator
KM_LON = 1.0 / 111.19492664455873


def _path(mid: int, start_km: float, end_km: float, n_pts: int = 21) -> GP.Path:
    """Straight west-east path along the equator spanning [start, end] km."""
    xs = np.linspace(start_km * KM_LON, end_km * KM_LON, n_pts)
    ys = np.zeros(n_pts)
    return GP.Path((mid,), xs, ys)


def _overlap_matrix(paths):
    """Pairwise cospatiality ENTRY LISTS (the reference's `cospatialities`
    array: one entry per (S-part, T-part) intersection pair; None when the
    kernel returns null or every part fell to the 2 m filter)."""
    n = len(paths)
    ov = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            c = K.cospatiality_two_sided(
                paths[i].xs, paths[i].ys, paths[j].xs, paths[j].ys
            )
            if c is not None and c["entries"]:
                ov[i][j] = ov[j][i] = c["entries"]
    return ov


def _sum_overlap(entries):
    """Constrainer-side overlap (findNonAxiomaticPaths.js:115-128): SUM the
    sIntxn extents over ALL entries, sum the tIntxn extents over ALL
    entries, take the max of the two sums."""
    s = sum(e["a_end_km"] - e["a_start_km"] for e in entries)
    t = sum(e["b_end_km"] - e["b_start_km"] for e in entries)
    return max(s, t)


def _first_overlap(entries):
    """Fork-side overlap (:175-180): _.first(cospat) only."""
    e = entries[0]
    return max(e["a_end_km"] - e["a_start_km"], e["b_end_km"] - e["b_start_km"])


def _reference_port(paths, ov):
    """Direct transcription of the reference reduce (:95-216) + the
    strictly-greater max-total-length choice (:229-241), written
    independently of the engine implementation — including the
    constrainer-sums vs fork-reads-first asymmetry."""
    n = len(paths)
    has = [any(ov[i][j] is not None for j in range(n) if j != i) for i in range(n)]
    acc2 = [[]]
    for i in range(n):
        constrainers = []
        if has[i]:
            for j in range(i):
                if has[j] and ov[j][i] is not None and _sum_overlap(ov[j][i]) > 0.002:
                    constrainers.append(j)
        if constrainers:
            for combo in acc2:
                combo.append(1 if all(combo[k] == 0 for k in constrainers) else 0)
            continue
        fork = any(
            has[j] and ov[j][i] is not None and _first_overlap(ov[j][i]) > 0.002
            for j in range(i + 1, n)
        )
        if not fork:
            for combo in acc2:
                combo.append(1)
            continue
        clones = [list(c) for c in acc2]
        for c in acc2:
            c.append(1)
        for c in clones:
            c.append(0)
        acc2.extend(clones)
    lens = [p.length_km for p in paths]
    best, best_v = None, float("-inf")
    for combo in acc2:
        v = sum(ln for inc, ln in zip(combo, lens) if inc)
        if v > best_v:
            best_v, best = v, combo
    return [p.match_ids for inc, p in zip(best, paths) if inc]


def test_overlapping_pair_keeps_longer_plus_disjoint():
    """A and B overlap heavily (mutually exclusive); C is disjoint and must
    always be included. Max-total-length combo = {longer of A/B} + C."""
    a = _path(1, 0.0, 1.0)
    b = _path(2, 0.3, 1.8)  # longer, overlaps a by ~0.7 km
    c = _path(3, 5.0, 6.0)
    chosen = GP.exact_combo_select([a, b, c])
    ids = sorted(p.match_ids[0] for p in chosen)
    assert ids == [2, 3]


def test_chain_of_constraints_matches_reference_port():
    """Three mutually overlapping paths in a chain: the constrained reduce
    (not a naive independent-set search) decides inclusion; engine must
    equal the direct transcription."""
    paths = [
        _path(1, 0.0, 1.0),
        _path(2, 0.5, 1.6),
        _path(3, 1.4, 2.6),
        _path(4, 4.0, 4.5),
    ]
    want = sorted(_reference_port(paths, _overlap_matrix(paths)))
    got = sorted(p.match_ids for p in GP.exact_combo_select(paths))
    assert got == want


def test_single_path_trivially_chosen():
    p = _path(7, 0.0, 0.5)
    assert [q.match_ids for q in GP.exact_combo_select([p])] == [(7,)]


def test_all_disjoint_all_chosen():
    paths = [_path(i, 3.0 * i, 3.0 * i + 1.0) for i in range(5)]
    chosen = GP.exact_combo_select(paths)
    assert sorted(p.match_ids[0] for p in chosen) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("seed", range(8))
def test_randomized_small_n_equals_reference_port(seed):
    """Randomized n<=10 interval sets: engine == independent transcription
    exactly (combo set, max choice, tie handling)."""
    rng = np.random.RandomState(seed)
    n = int(rng.randint(2, 10))
    paths = []
    for i in range(n):
        s = float(rng.uniform(0, 6))
        ln = float(rng.uniform(0.05, 2.0))
        paths.append(_path(i, s, s + ln))
    want = sorted(_reference_port(paths, _overlap_matrix(paths)))
    got = sorted(p.match_ids for p in GP.exact_combo_select(paths))
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_randomized_n18_equals_reference_port(seed):
    """Randomized n=18 interval sets (past the old full-enumeration cap of
    15): the branch-and-bound engine == the independent 2^forks
    transcription exactly."""
    rng = np.random.RandomState(100 + seed)
    n = 18
    paths = []
    for i in range(n):
        s = float(rng.uniform(0, 12))
        ln = float(rng.uniform(0.05, 2.0))
        paths.append(_path(i, s, s + ln))
    want = sorted(_reference_port(paths, _overlap_matrix(paths)))
    got = sorted(p.match_ids for p in GP.exact_combo_select(paths))
    assert got == want


@pytest.mark.parametrize("seed", (7, 11))
def test_randomized_n22_equals_reference_port(seed):
    """n=22 (near the new cap): engine == transcription. Denser field so
    overlap clusters — and therefore forks — actually occur."""
    rng = np.random.RandomState(seed)
    n = 22
    paths = []
    for i in range(n):
        s = float(rng.uniform(0, 16))
        ln = float(rng.uniform(0.05, 2.0))
        paths.append(_path(i, s, s + ln))
    want = sorted(_reference_port(paths, _overlap_matrix(paths)))
    got = sorted(p.match_ids for p in GP.exact_combo_select(paths))
    assert got == want


def test_exact_tie_prefers_first_combo_in_reference_order():
    """Two bit-identical-length paths over the same span: values tie
    exactly, and the reference's strictly-greater scan keeps the FIRST max
    in combo-list order — the include branch of the fork (A=1, B=0). The
    branch-and-bound must reproduce that tie-break via its explicit
    (value, f_k..f_1) key, not land on either arbitrarily."""
    a = _path(1, 0.0, 1.0)
    b = _path(2, 0.0, 1.0)
    want = sorted(_reference_port([a, b], _overlap_matrix([a, b])))
    chosen = GP.exact_combo_select([a, b])
    assert sorted(p.match_ids for p in chosen) == want == [(1,)]


def _weave_path(mid, t_knots_m, y_knots_m, step_m=0.5, t_max=None):
    """Path along the equator whose lateral offset (meters) follows the
    piecewise-linear profile (t_knots_m, y_knots_m); vertices every
    `step_m` meters of along-x distance."""
    t_max = t_max if t_max is not None else t_knots_m[-1]
    t = np.arange(0.0, t_max + step_m / 2, step_m)
    y = np.interp(t, t_knots_m, y_knots_m)
    return GP.Path((mid,), t / 1000.0 * KM_LON, y / 1000.0 * KM_LON)


def test_weaving_pair_has_multi_interval_entries():
    """One line exits and re-enters the other's 5 m corridor: the kernel
    must return one cospatiality ENTRY per surviving (A-part, B-part)
    pair — the reference's intersection-part cross product
    (getCospatialityOfLinestrings.js:357-366 MultiLineString parts,
    :298-303 2 m part filter, :241 ascending length order) — with the
    hull fields as the derived envelope."""
    a = _weave_path(1, [0, 60], [0, 0])  # straight, 60 m
    # B: alongside A for ~12 m, out to 24 m lateral, back alongside
    b = _weave_path(2, [0, 12, 24, 36, 48, 60], [0, 0, 24, 24, 0, 0])
    c = K.cospatiality_two_sided(a.xs, a.ys, b.xs, b.ys)
    assert c is not None
    entries = c["entries"]
    # two disjoint runs on each side -> 2x2 part pairs
    assert len(entries) == 4
    for e in entries:
        for s, t in (("a_start_km", "a_end_km"), ("b_start_km", "b_end_km")):
            assert e[t] - e[s] > 0.002  # every part survived the 2 m filter
    # parts are ordered ascending by length (first entry = shortest pair)
    a_exts = [e["a_end_km"] - e["a_start_km"] for e in entries]
    b_exts = [e["b_end_km"] - e["b_start_km"] for e in entries]
    assert a_exts == sorted(a_exts)
    assert b_exts[:2] == sorted(b_exts[:2])
    # hull == envelope of the entry intervals
    assert c["a_start_km"] == min(e["a_start_km"] for e in entries)
    assert c["a_end_km"] == max(e["a_end_km"] for e in entries)
    assert c["b_start_km"] == min(e["b_start_km"] for e in entries)
    assert c["b_end_km"] == max(e["b_end_km"] for e in entries)
    # the constrainer SUM (double-counting the cross product, exactly like
    # findNonAxiomaticPaths.js:115-128) strictly exceeds the fork check's
    # first-entry extent — the asymmetry is observable on this fixture
    assert _sum_overlap(entries) > _first_overlap(entries)


def test_weaving_fixture_engine_equals_reference_port():
    """Transcription test on the exit-and-re-enter fixture (round-4
    VERDICT item 2 done-criterion): engine == independent port of the
    reduce with sum-for-constrainers / first-for-fork."""
    paths = [
        _weave_path(1, [0, 60], [0, 0]),
        _weave_path(2, [0, 12, 24, 36, 48, 60], [0, 0, 24, 24, 0, 0]),
        _weave_path(3, [0, 60], [0, 0]),  # third body forces real forking
        _path(4, 0.2, 0.5),  # overlaps the straight lines' corridor
    ]
    want = sorted(_reference_port(paths, _overlap_matrix(paths)))
    got = sorted(p.match_ids for p in GP.exact_combo_select(paths))
    assert got == want


def test_all_short_runs_mean_no_overlap():
    """B dips toward A's corridor only in sub-2m touches (every B-side
    intersection part falls to the reference's 2 m part filter,
    getCospatialityOfLinestrings.js:301-303): entries must be EMPTY even
    though the hull envelope spans ~25 m, and exact_combo_select must
    treat the pair as NON-overlapping (the reference gets a null
    cospatiality then) — the old hull-based overlap would have wrongly
    constrained here."""
    a = _weave_path(1, [0, 40], [0, 0], step_m=0.0625)
    t = np.arange(0.0, 40.0 + 0.03125, 0.0625)
    y = np.minimum(8.0, np.minimum(4.5 + 4 * np.abs(t - 10), 4.5 + 4 * np.abs(t - 30)))
    b = GP.Path((2,), t / 1000.0 * KM_LON, y / 1000.0 * KM_LON)
    c = K.cospatiality_two_sided(a.xs, a.ys, b.xs, b.ys)
    assert c is not None
    assert c["entries"] == []  # every B part <= 2 m of arc
    assert c["b_end_km"] - c["b_start_km"] > 0.002  # hull alone would fire
    chosen = GP.exact_combo_select([a, b])
    assert sorted(p.match_ids[0] for p in chosen) == [1, 2]


def test_fallback_cap_above_exact_n():
    """Above EXACT_COMBO_MAX_N the chooser must not enumerate 2^n combos:
    the real segment chooser, fed n > cap mutually-overlapping candidates
    that all fail the annealed axioms (each starts km from the segment),
    returns exactly the single capped longest path."""
    n = GP.EXACT_COMBO_MAX_N + 3
    seg = _path(0, 0.0, 1.0)  # the GTFS segment itself, near origin
    cands = [
        {
            "match_id": i + 1,
            "shst_reference": f"r{i+1}",
            # the 0.003 km offset keeps every end >= 3 m from every other
            # candidate's start (off the shared 0.05 grid), so no pair can
            # stitch via the 2 m merge_geospatial gap rule at any n
            "xs": _path(0, 5.0 + 0.05 * i, 6.003 + 0.1 * i).xs,
            "ys": np.full(21, 0.0),
        }
        for i in range(n)
    ]
    out = GP.choose_paths_for_segment(cands, seg.xs, seg.ys)
    assert len(out) == 1
    # the capped choice is the LONGEST candidate (largest i)
    assert out[0].match_ids == (n,)
