"""Unit tests for the Pass-B graph machinery (graph_paths) — subgraph,
components, Dijkstra, merge fixpoint, annealed choice — on synthetic
match sets with known answers."""

import numpy as np

from gtfs_conflation_pipeline_spark.operators import graph_paths as G


def seg(x0, x1, n=6, y=42.0):
    xs = np.round(np.linspace(x0, x1, n), 6)
    ys = np.full(n, y)
    return xs, ys


SEG_XS, SEG_YS = seg(-74.0, -73.98, 21)  # ~1.65 km straight segment


def match(mid, x0, x1, y=42.0, ref=None):
    xs, ys = seg(x0, x1, 6, y)
    return {"match_id": mid, "shst_reference": ref or f"r{mid}", "xs": xs, "ys": ys}


def test_components_split_disjoint():
    edges = G.build_edges(
        [match(1, -74.0, -73.995), match(2, -73.990, -73.985)], SEG_XS, SEG_YS
    )
    comps = G.connected_components(edges)
    assert len(comps) == 2


def test_chain_merges_into_one_path():
    # three contiguous matches share endpoints exactly -> one dijkstra path
    ms = [match(1, -74.0, -73.995), match(2, -73.995, -73.99), match(3, -73.99, -73.985)]
    paths = G.choose_paths_for_segment(ms, SEG_XS, SEG_YS)
    assert len(paths) == 1
    assert paths[0].match_ids == (1, 2, 3)


def test_dijkstra_prefers_low_weight_branch():
    # two parallel branches between same endpoints; the offset one has
    # higher RMSD -> heavier -> not chosen
    good = match(1, -74.0, -73.99)
    bad = match(2, -74.0, -73.99, y=42.0008)  # ~90 m off the segment
    # force same endpoints so they are graph-parallel
    bad["xs"] = good["xs"].copy()
    bad["ys"] = np.array([42.0, 42.0008, 42.0008, 42.0008, 42.0008, 42.0])
    paths = G.choose_paths_for_segment([good, bad], SEG_XS, SEG_YS)
    assert len(paths) >= 1
    assert paths[0].match_ids == (1,)


def test_merge_geospatial_gap_tolerance():
    a = G.Path((1,), *seg(-74.0, -73.995))
    b = G.Path((2,), *seg(-73.99499, -73.99))  # ~1 m gap
    c = G.Path((3,), *seg(-73.99, -73.985))
    m = G.merge_geospatial(a, b)
    assert m is not None and m.match_ids == (1, 2)
    # far gap rejected
    far = G.Path((4,), *seg(-73.98, -73.975))
    assert G.merge_geospatial(a, far) is None
    # loop rejected: b2 ends exactly at a's start
    b2 = G.Path((5,), *seg(-73.995, -74.0))
    assert G.merge_geospatial(a, b2) is None
    del c


def test_merge_by_metadata_overlap():
    # overlapping match edges share EXACT coordinates: b passes through a's
    # last vertex (-73.99); the stitch must keep b's interior vertices
    a = G.Path((1, 2, 3), *seg(-74.0, -73.99))
    b = G.Path(
        (2, 3, 4),
        np.array([-73.995, -73.99, -73.988, -73.986, -73.985]),
        np.array([42.0, 42.0, 42.0005, 42.0, 42.0]),
    )
    m = G.merge_by_metadata(a, b)
    assert m is not None and m.match_ids == (1, 2, 3, 4)
    # b's remainder geometry (beyond a's end) is preserved, incl. the
    # off-axis interior vertex at -73.988
    assert -73.988 in set(np.round(m.xs, 6))
    assert m.xs[-1] == -73.985
    # metadata overlap but geometrically disjoint -> merge refused
    b_far = G.Path((2, 3, 4), *seg(-73.95, -73.94))
    assert G.merge_by_metadata(a, b_far) is None
    # no id overlap -> no merge
    assert G.merge_by_metadata(a, G.Path((7, 8), *seg(-73.98, -73.97))) is None


def test_union_paths_subset_drop():
    big = G.Path((1, 2, 3), *seg(-74.0, -73.985))
    small = G.Path((2, 3), *seg(-73.995, -73.985))
    # disjoint-id distinct path must survive
    other = G.Path((9,), *seg(-73.9, -73.895))
    out = G.union_paths([big, small, other])
    id_sets = {p.match_ids for p in out}
    assert (1, 2, 3) in id_sets and (2, 3) not in id_sets
    assert any(9 in p.match_ids for p in out)


def test_annealing_relaxes_until_choice():
    # single short offset match: fails strict thresholds, chosen after relax
    short = match(1, -74.0, -73.9999)  # ~8 m long
    paths = G.choose_paths_for_segment([short], SEG_XS, SEG_YS)
    assert len(paths) == 1


def test_exhausted_ladder_runs_exact_combo_branch():
    """When every path fails the annealed axioms even at the relaxed bounds
    (all candidates start ~4 km from the segment start, gap >> 0.1 km
    ceiling), the chooser must run the reference's EXACT non-axiomatic
    combo enumeration (findNonAxiomaticPaths.js): of two mutually
    overlapping far paths keep the longer, plus the disjoint one — NOT the
    single-longest-path cap (which would return one path)."""
    a = match(1, -73.95, -73.94)  # ~0.83 km
    b = match(2, -73.945, -73.93)  # ~1.24 km, overlaps a by ~0.4 km
    c = match(3, -73.90, -73.895)  # ~0.41 km, disjoint
    paths = G.choose_paths_for_segment([a, b, c], SEG_XS, SEG_YS)
    ids = sorted(mid for p in paths for mid in p.match_ids)
    assert ids == [2, 3]


def test_agrees_with_greedy_on_fixture_candidates(spark, tmp_path):
    """On the deterministic fixture the full Pass-B chooser selects the same
    shst_references per segment as the engine's greedy interval cover."""
    from gtfs_conflation_pipeline_spark.plans.pipeline import run_pipeline

    out = run_pipeline(spark, 500, str(tmp_path / "ck"), partitions=4)
    matches = out["matches"].toPandas()
    net = out["net_segments"].toPandas()
    osm = out["osm_segments"].toPandas()
    osm_by_id = {r.segment_id: r for r in osm.itertuples(index=False)}
    checked = agree = 0
    for seg_row in net.itertuples(index=False):
        mine = matches[
            (matches.shape_id == seg_row.shape_id)
            & (matches.shape_index == seg_row.shape_index)
        ]
        if len(mine) == 0:
            continue
        cand = [
            {
                "match_id": int(r.segment_id),
                "shst_reference": r.shst_reference,
                "xs": np.asarray(osm_by_id[r.segment_id].xs),
                "ys": np.asarray(osm_by_id[r.segment_id].ys),
            }
            for r in mine.itertuples(index=False)
        ]
        chosen = G.choose_paths_for_segment(
            cand, np.asarray(seg_row.xs), np.asarray(seg_row.ys)
        )
        chosen_ids = {mid for p in chosen for mid in p.match_ids}
        # Pass-B never picks something greedy rejected...
        assert chosen_ids <= set(mine.segment_id), (
            seg_row.shape_id,
            seg_row.shape_index,
        )
        # ...and on connected candidates the two choosers agree exactly.
        # (They legitimately differ when a perturbed chunk leaves a >2 m
        # graph gap: greedy covers disjoint intervals, the axiomatic path
        # choice keeps only qualifying paths.)
        if chosen_ids == set(mine.segment_id):
            agree += 1
        checked += 1
    assert checked > 10
    assert agree / checked >= 0.7, f"only {agree}/{checked} segments agree"
