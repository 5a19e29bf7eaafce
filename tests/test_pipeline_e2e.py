"""End-to-end conflation equivalence vs the single-process numpy oracle
(SURVEY.md §5.3): exact join-output rows, exact tile assignments, and the
checkpoint/resume + payload invariants."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.oracle import oracle_conflation
from gtfs_conflation_pipeline_spark.plans.pipeline import run_pipeline

N_IMAGES = 1500  # 30 shapes — small enough for the brute-force oracle


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt"))
    out = run_pipeline(spark, N_IMAGES, d, partitions=8)
    return d, out


@pytest.fixture(scope="module")
def oracle_out():
    return oracle_conflation(N_IMAGES)


MATCH_KEY = ["shape_id", "shape_index", "shst_reference"]


def test_match_rows_equal_oracle(pipeline_out, oracle_out):
    _, out = pipeline_out
    eng = (
        out["matches"]
        .toPandas()
        .sort_values(MATCH_KEY)
        .reset_index(drop=True)
    )
    orc = oracle_out["matches"].sort_values(MATCH_KEY).reset_index(drop=True)
    assert len(eng) == len(orc), f"row count {len(eng)} != oracle {len(orc)}"
    for k in MATCH_KEY + ["segment_id", "along_idx"]:
        assert (eng[k].values == orc[k].values).all(), f"mismatch col {k}"
    for k in ["section_start", "section_end", "intxn_len_km", "mean_dev_km"]:
        assert np.allclose(eng[k].values, orc[k].values, atol=1e-9), f"col {k}"


def test_tiles_equal_oracle(pipeline_out, oracle_out):
    _, out = pipeline_out
    eng = (
        out["tiles"]
        .toPandas()
        .sort_values(["segment_id", "min_zoom", "tile_id"])
        .reset_index(drop=True)
    )
    orc = (
        oracle_out["tiles"]
        .sort_values(["segment_id", "min_zoom", "tile_id"])
        .reset_index(drop=True)
    )
    assert len(eng) == len(orc)
    for k in ["segment_id", "min_zoom", "tile_id"]:
        assert (eng[k].values == orc[k].values).all(), f"mismatch col {k}"


def test_scores_equal_oracle(pipeline_out, oracle_out):
    _, out = pipeline_out
    key = ["shape_id", "shape_index", "shst_reference"]
    eng = out["match_scores"].toPandas().sort_values(key).reset_index(drop=True)
    orc = oracle_out["scores"].sort_values(key).reset_index(drop=True)
    assert len(eng) == len(orc)
    for k in key + ["segment_id"]:
        assert (eng[k].values == orc[k].values).all(), f"col {k}"
    for k in ["frechet_km", "hausdorff_km", "mean_dev_km", "shape_similarity"]:
        assert np.allclose(eng[k].values, orc[k].values, atol=1e-9), f"col {k}"


def test_match_paths_equal_oracle(pipeline_out, oracle_out):
    """Pass-B pipeline output (gtfs_shape_shst_match_paths analog) must be
    bit-exact vs the numpy oracle running the same subgraph -> Dijkstra ->
    union -> anneal chain over brute-force corridor candidates."""
    _, out = pipeline_out
    key = ["shape_id", "shape_index", "path_index", "path_edge_index"]
    eng = out["match_paths"].toPandas().sort_values(key).reset_index(drop=True)
    orc = oracle_out["match_paths"].sort_values(key).reset_index(drop=True)
    assert len(eng) == len(orc), f"row count {len(eng)} != oracle {len(orc)}"
    for k in key + ["match_id", "shst_reference"]:
        assert (eng[k].values == orc[k].values).all(), f"mismatch col {k}"
    assert np.allclose(eng["path_len_km"].values, orc["path_len_km"].values, atol=1e-9)
    # decomposition invariant: path_edge_index is dense 0..k per path
    g = eng.groupby(["shape_id", "shape_index", "path_index"]).path_edge_index
    assert (g.min() == 0).all() and (g.max() + 1 == g.count()).all()


def test_match_paths_agree_with_greedy_at_pipeline_level(pipeline_out):
    """Pipeline-level promotion of the greedy==graph agreement test.

    The two choosers differ by design in exactly two ways: (a) Pass-B path
    linestrings legitimately absorb SUB-THRESHOLD connector/tail edges
    (cover < MIN_COVER_RATIO) that greedy's length-ratio filter drops up
    front, and (b) when a >2 m graph gap splits candidates, greedy covers
    disjoint intervals while the annealed path choice keeps only qualifying
    paths. So the invariant asserted here: restricted to above-threshold
    candidates, the Pass-B match set EQUALS the greedy cover on >= 90% of
    matched segments — and Pass-B never selects an OSM segment the corridor
    refine rejected."""
    from gtfs_conflation_pipeline_spark.operators.spatial_join import MIN_COVER_RATIO

    _, out = pipeline_out
    mp = out["match_paths"].toPandas()
    mt = out["matches"].toPandas()
    refined = out["refined"].toPandas()
    net = out["net_segments"].toPandas()
    ref_keys = set(zip(refined.shape_id, refined.shape_index, refined.segment_id))
    for r in mp.itertuples(index=False):
        assert (r.shape_id, r.shape_index, r.match_id) in ref_keys
    g_len = {(r.shape_id, r.shape_index): r.length_km for r in net.itertuples(index=False)}
    cover = {
        (r.shape_id, r.shape_index, r.segment_id): r.intxn_len_km / g_len[(r.shape_id, r.shape_index)]
        for r in refined.itertuples(index=False)
    }
    greedy = mt.groupby(["shape_id", "shape_index"]).segment_id.agg(set)
    graph = mp.groupby(["shape_id", "shape_index"]).match_id.agg(set)
    both = greedy.index.intersection(graph.index)
    assert len(both) > 10
    agree = sum(
        1
        for k in both
        if {m for m in graph[k] if cover.get((*k, m), 0.0) >= MIN_COVER_RATIO} == greedy[k]
    )
    assert agree / len(both) >= 0.9, f"only {agree}/{len(both)} segments agree"


def test_cospatiality_two_sided_backtracking_kernel():
    """The B interval must come from an independent projection: a B that
    traverses A forward then backtracks is cospatial over its WHOLE length,
    which min/max-of-A-snap-positions (corridor_match) understates."""
    from gtfs_conflation_pipeline_spark import kernels as K

    # A: straight 1 km west->east at lat 42
    ax = np.linspace(-74.0, -73.9879, 30)
    ay = np.full(30, 42.0)
    # B: along A from 20% to 80%, then backtracking to 50%
    fwd = np.linspace(-73.99758, -73.99032, 15)
    back = np.linspace(-73.99032, -73.99395, 8)[1:]
    bx = np.concatenate([fwd, back])
    by = np.full(bx.size, 42.0)
    b_len = K.polyline_length_km(bx, by)

    two = K.cospatiality_two_sided(ax, ay, bx, by, radius_km=0.005)
    one = K.corridor_match(ax, ay, bx, by, radius_km=0.005)
    assert two is not None and one is not None
    # two-sided: B cospatial over essentially its whole (backtracking) length
    assert two["b_end_km"] - two["b_start_km"] == pytest.approx(b_len, rel=0.02)
    # the one-sided min/max-of-snaps B interval loses the backtrack portion
    assert (one["b_end_km"] - one["b_start_km"]) < 0.8 * b_len
    # A interval identical between the two (same A-side projection)
    assert two["a_start_km"] == pytest.approx(one["a_start_km"], abs=1e-12)
    assert two["a_end_km"] == pytest.approx(one["a_end_km"], abs=1e-12)


def test_cospatiality_pair_table_equals_bruteforce(pipeline_out):
    """Spark map_segments_cospatiality (cell self-join + bbox prefilter +
    Arrow kernel) == brute-force all-pairs numpy over the same OSM table:
    any cell-recall miss or dedupe bug shows up as a row diff."""
    from gtfs_conflation_pipeline_spark import kernels as K

    _, out = pipeline_out
    eng = (
        out["cospatiality"]
        .toPandas()
        .sort_values(["segment_id_a", "segment_id_b"])
        .reset_index(drop=True)
    )
    osm = out["osm_segments"].toPandas()
    rows = []
    segs = list(osm.itertuples(index=False))
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            a, b = segs[i], segs[j]
            if a.segment_id > b.segment_id:
                a, b = b, a
            m = K.cospatiality_two_sided(
                np.asarray(a.xs), np.asarray(a.ys),
                np.asarray(b.xs), np.asarray(b.ys), radius_km=0.005,
            )
            if m is None:
                continue
            rows.append({"segment_id_a": a.segment_id, "segment_id_b": b.segment_id, **m})
    orc = (
        pd.DataFrame(rows)
        .sort_values(["segment_id_a", "segment_id_b"])
        .reset_index(drop=True)
    )
    assert len(eng) == len(orc), f"rows {len(eng)} != oracle {len(orc)}"
    assert len(eng) > 0
    for k in ["segment_id_a", "segment_id_b"]:
        assert (eng[k].values == orc[k].values).all(), f"col {k}"
    for k in ["a_start_km", "a_end_km", "b_start_km", "b_end_km", "intxn_a_km", "intxn_b_km"]:
        assert np.allclose(eng[k].values, orc[k].values, atol=1e-12), f"col {k}"


def test_dropped_chunks_unmatched(oracle_out, pipeline_out):
    """Fixture mode (s+c)%10==0 drops the OSM chunk — those slots must not
    produce full-coverage matches from the true segment, and distractor
    (mode 2) segments must never be chosen."""
    _, out = pipeline_out
    eng = out["matches"].toPandas()
    assert not eng["shst_reference"].str.startswith("shst_x").any()


def test_resume_is_idempotent_and_skips_compute(spark, pipeline_out):
    d, out = pipeline_out
    before = out["matches"].toPandas().sort_values(MATCH_KEY).reset_index(drop=True)
    # re-run: every stage's manifest is complete -> compute skipped, outputs equal
    out2 = run_pipeline(spark, N_IMAGES, d, partitions=8)
    after = out2["matches"].toPandas().sort_values(MATCH_KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_resume_after_partial_failure(spark, tmp_path):
    """Kill-after-stage-k resume (SURVEY.md §5.5): complete early stages,
    then run the full pipeline — early manifests are reused (mtime unchanged),
    and the final output matches the oracle-verified full run."""
    d = str(tmp_path / "ckpt2")
    small = 500
    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager

    ck = CheckpointManager(d)
    FX_df = FX.images_table(spark, small, partitions=4)
    ck.write(FX_df, "images")
    mtime = os.path.getmtime(os.path.join(d, "images", "_manifest.json"))
    out = run_pipeline(spark, small, d, partitions=4)
    assert os.path.getmtime(os.path.join(d, "images", "_manifest.json")) == mtime
    orc = oracle_conflation(small)
    eng = out["matches"].toPandas().sort_values(MATCH_KEY).reset_index(drop=True)
    assert len(eng) == len(orc["matches"])


def test_n_buckets_knob_outputs_identical(spark, tmp_path):
    """The bucket-count knob (round-3 VERDICT item 9): n_buckets sizes
    bucketed-scan parallelism only — stage OUTPUTS are bit-identical at
    any value (8 vs 64 here; deployment rule: buckets >= target read
    parallelism, run_pipeline docstring)."""
    small = 500
    outs = {}
    for nb in (8, 64):
        out = run_pipeline(
            spark, small, str(tmp_path / f"ckpt_nb{nb}"), partitions=4, n_buckets=nb
        )
        outs[nb] = {
            "matches": out["matches"]
            .toPandas()
            .sort_values(MATCH_KEY)
            .reset_index(drop=True),
            "probe_data": out["probe_data"]
            .toPandas()
            .sort_values(["trip_id", "segment_id", "epoch"])
            .reset_index(drop=True),
        }
    pd.testing.assert_frame_equal(outs[8]["matches"], outs[64]["matches"])
    pd.testing.assert_frame_equal(outs[8]["probe_data"], outs[64]["probe_data"])


def test_manifest_lineage(pipeline_out):
    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager

    d, out = pipeline_out
    ck = CheckpointManager(d)
    m = ck.manifest("matches")
    assert m["complete"]
    assert m["rows_out"] == out["matches"].count()
    assert m["metrics"]["matched_segments"] > 0
    tm = ck.manifest("tiles")
    assert sum(p["rows_out"] for p in tm["partitions"]) == tm["rows_out"]
    assert any("cells_touched" in p for p in tm["partitions"])


def test_scheduled_traffic_reconciliation_metric(pipeline_out):
    """Feed-level row-count reconciliation (reference
    GtfsScheduledTrafficDAO/loaders.js:86-104): spans == stop_times rows -
    trips on the clean fixture, and the shortfall is recorded in the stage
    manifest."""
    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager

    d, out = pipeline_out
    m = CheckpointManager(d).manifest("scheduled_traffic")["metrics"]
    assert m["spans"] == out["scheduled_traffic"].count()
    assert m["reconciliation_shortfall"] == 0
    assert m["expected_spans"] == m["spans"]


def test_payload_invariant_after_checkpoint(pipeline_out):
    """input_hint per-row invariant: decoded pixels + caption equality after
    checkpoint round-trip."""
    _, out = pipeline_out
    rows = out["images"].orderBy("image_id").limit(10).collect()
    ref = FX.images_batch(np.arange(10))
    for k, r in enumerate(rows):
        pix = np.frombuffer(bytes(r.bytes), np.uint8).reshape(r.w, r.h, 3)
        assert np.array_equal(pix, FX.image_pixels(k))
        assert r.caption == ref["caption"][k]


def test_pipeline_stage_joins_are_shuffle_free(spark, pipeline_out):
    """Co-located storage proof at the PIPELINE level (round-3 VERDICT item
    3): stages are checkpointed bucketed on shape_id, so the two hottest
    re-joins — refined x g_len (the choose-stage attach) and
    scheduled_traffic x matches (probe_data) — run with NO shuffle
    Exchange. Broadcast is disabled for the check so the proof is the
    bucketed SortMergeJoin, not a trivially exchange-free broadcast."""
    from pyspark.sql import functions as F

    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager
    from gtfs_conflation_pipeline_spark.sources.bucketed import join_is_shuffle_free

    d, _ = pipeline_out
    ck = CheckpointManager(d)
    refined = ck.read(spark, "refined")
    net = ck.read(spark, "net_segments")
    g_len = net.select(
        "shape_id", "shape_index", F.col("length_km").alias("g_len_km")
    )
    traffic = ck.read(spark, "scheduled_traffic")
    matches = ck.read(spark, "matches")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", old
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j1 = refined.join(g_len, ["shape_id", "shape_index"])
        assert join_is_shuffle_free(j1), "refined x g_len re-shuffled"
        j2 = traffic.join(
            matches.select("shape_id", "shape_index", "segment_id"), "shape_id"
        )
        assert join_is_shuffle_free(j2), "scheduled_traffic x matches re-shuffled"
        # and the choose-stage aggregation consumes the buckets in place too
        agg = refined.groupBy("shape_id", "shape_index").count()
        assert join_is_shuffle_free(agg), "choose-stage groupBy re-shuffled"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_stage_resume_reregisters_catalog(spark, pipeline_out):
    """A fresh session (in-memory catalog) must be able to resume bucketed
    stages: read() re-creates the catalog row from the manifest's recorded
    spec. Simulated by dropping the table before reading."""
    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager

    d, out = pipeline_out
    ck = CheckpointManager(d)
    spec = ck.manifest("matches")["bucketed"]
    assert spec and spec["bucket_cols"] == ["shape_id"]
    spark.sql(f"DROP TABLE IF EXISTS `{spec['table']}`")
    got = ck.read(spark, "matches")
    assert got.count() == out["matches"].count()
    assert spark.catalog.tableExists(spec["table"])
