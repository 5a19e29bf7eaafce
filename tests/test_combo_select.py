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
    n = len(paths)
    ov = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            c = K.cospatiality_two_sided(
                paths[i].xs, paths[i].ys, paths[j].xs, paths[j].ys
            )
            if c is not None:
                ov[i][j] = ov[j][i] = max(c["intxn_a_km"], c["intxn_b_km"])
    return ov


def _reference_port(paths, ov):
    """Direct transcription of the reference reduce (:95-216) + the
    strictly-greater max-total-length choice (:229-241), written
    independently of the engine implementation."""
    n = len(paths)
    has = [any(ov[i][j] is not None for j in range(n) if j != i) for i in range(n)]
    acc2 = [[]]
    for i in range(n):
        constrainers = []
        if has[i]:
            for j in range(i):
                if has[j] and ov[j][i] is not None and ov[j][i] > 0.002:
                    constrainers.append(j)
        if constrainers:
            for combo in acc2:
                combo.append(1 if all(combo[k] == 0 for k in constrainers) else 0)
            continue
        fork = any(
            has[j] and ov[j][i] is not None and ov[j][i] > 0.002
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
            "xs": _path(0, 5.0 + 0.05 * i, 6.0 + 0.1 * i).xs,
            "ys": np.full(21, 0.0),
        }
        for i in range(n)
    ]
    out = GP.choose_paths_for_segment(cands, seg.xs, seg.ys)
    assert len(out) == 1
    # the capped choice is the LONGEST candidate (largest i)
    assert out[0].match_ids == (n,)
