"""Coord-subset redundant-match removal (reference
removeRedundantMatches.js:4-85): per (target segment, shst ref), matches
whose coordinate set is a subset of an already-kept match's set are
dropped, in descending coord-count order with the non-OSRM-assisted
preference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark.operators.spatial_join import (
    remove_redundant_matches,
)

COLS = "shape_id string, shape_index int, shst_reference string, tag string, m_xs array<double>, m_ys array<double>, assisted int"


def _xs(*vals):
    return [round(v, 6) for v in vals]


@pytest.fixture()
def base_rows():
    full_x = _xs(-74.0, -73.9999, -73.9998, -73.9997, -73.9996)
    full_y = _xs(42.0, 42.0001, 42.0002, 42.0003, 42.0004)
    return full_x, full_y


def test_nested_subsets_dropped(spark, base_rows):
    full_x, full_y = base_rows
    rows = [
        ("s", 0, "r1", "full", full_x, full_y, 0),
        ("s", 0, "r1", "sub3", full_x[:3], full_y[:3], 0),   # subset of full
        ("s", 0, "r1", "sub2", full_x[1:3], full_y[1:3], 0),  # subset of both
        ("s", 0, "r1", "uniq", _xs(-74.0, -73.95), _xs(42.0, 42.01), 0),
        ("s", 0, "r2", "othr", full_x[:3], full_y[:3], 0),   # other ref kept
        ("s", 1, "r1", "oseg", full_x[:2], full_y[:2], 0),   # other seg kept
        ("s", 0, "r1", "degn", full_x[:1], full_y[:1], 0),   # <2 coords drop
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {r.tag for r in remove_redundant_matches(df).collect()}
    assert got == {"full", "uniq", "othr", "oseg"}


def test_partial_overlap_with_unique_coords_kept(spark, base_rows):
    full_x, full_y = base_rows
    # B shares 2 coords with A but has one coord of its own -> kept
    rows = [
        ("s", 0, "r1", "A", full_x[:4], full_y[:4], 0),
        ("s", 0, "r1", "B", full_x[2:4] + _xs(-73.90), full_y[2:4] + _xs(42.05), 0),
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {r.tag for r in remove_redundant_matches(df).collect()}
    assert got == {"A", "B"}


def test_greedy_order_matters(spark, base_rows):
    """Z is a subset of Y (kept earlier, same size class) but not of X —
    the reference's greedy order drops it."""
    full_x, full_y = base_rows
    y_x = _xs(-73.90, -73.89, -73.88)
    y_y = _xs(42.05, 42.06, 42.07)
    rows = [
        ("s", 0, "r1", "X", full_x[:4], full_y[:4], 0),
        ("s", 0, "r1", "Y", y_x, y_y, 0),
        ("s", 0, "r1", "Z", y_x[:2], y_y[:2], 0),
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {r.tag for r in remove_redundant_matches(df).collect()}
    assert got == {"X", "Y"}


def test_assisted_tiebreak_prefers_unassisted(spark, base_rows):
    """Equal coordinate sets: the non-OSRM-assisted copy is kept (sorted
    first), the assisted duplicate is a subset and drops."""
    full_x, full_y = base_rows
    rows = [
        ("s", 0, "r1", "assisted", full_x[:3], full_y[:3], 1),
        ("s", 0, "r1", "clean", full_x[:3], full_y[:3], 0),
    ]
    df = spark.createDataFrame(rows, COLS)
    got = [
        r.tag
        for r in remove_redundant_matches(df, assisted_col="assisted").collect()
    ]
    assert got == ["clean"]


def test_noop_on_engine_refine_output_shape(spark, base_rows):
    """One-row-per-(pair, ref) input (the in-engine refine contract) passes
    through untouched — the operator is a no-op by construction there."""
    full_x, full_y = base_rows
    rows = [
        ("s", i, f"r{i}", f"m{i}", full_x, full_y, 0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, COLS)
    out = remove_redundant_matches(df)
    assert out.count() == 5
    assert set(out.columns) == set(df.columns)


def test_pipeline_matches_survive_injected_subsets(spark):
    """E2E-style: slice the real pipeline match geometries (the external
    matcher payload analog), inject nested partial duplicates, and assert
    the operator returns exactly the original rows — so choose over the
    cleaned set is bit-identical to choose over the originals."""
    from gtfs_conflation_pipeline_spark import fixtures as FX
    from gtfs_conflation_pipeline_spark import kernels as K
    from gtfs_conflation_pipeline_spark.operators import snap, spatial_join

    images = FX.images_table(spark, 500, partitions=4)
    osm = FX.osm_segments_table(spark, 500, partitions=4)
    raw = FX.raw_tables(spark, images)
    shapes = __import__(
        "gtfs_conflation_pipeline_spark.plans.pipeline", fromlist=["x"]
    ).geo_shapes_from_raw(raw["shapes"])
    sws = snap.shapes_with_stop_sequences(
        shapes, raw["stops"], raw["trips"], raw["stop_times"]
    )
    net = snap.snap_and_slice(sws)
    refined = spatial_join.refine(spatial_join.candidate_pairs(net, osm))
    g = net.select(
        "shape_id", "shape_index", "xs", "ys"
    ).join(refined, ["shape_id", "shape_index"])
    rows = g.limit(40).collect()
    assert rows
    recs = []
    for i, r in enumerate(rows):
        sx, sy = K.line_slice_along(
            np.asarray(r.xs), np.asarray(r.ys), r.section_start, r.section_end
        )
        sx, sy = K.round6(sx).tolist(), K.round6(sy).tolist()
        if len(sx) < 3:
            continue
        recs.append((r.shape_id, r.shape_index, r.shst_reference, f"orig{i}", sx, sy, 0))
        # injected nested partials: strict coordinate subsets
        recs.append(
            (r.shape_id, r.shape_index, r.shst_reference, f"dupA{i}", sx[:-1], sy[:-1], 0)
        )
        recs.append(
            (r.shape_id, r.shape_index, r.shst_reference, f"dupB{i}", sx[1:3], sy[1:3], 1)
        )
    df = spark.createDataFrame(recs, COLS)
    out = remove_redundant_matches(df, assisted_col="assisted").collect()
    tags = {r.tag for r in out}
    assert tags == {t for t in tags if t.startswith("orig")}
    assert len(out) == sum(1 for rec in recs if rec[3].startswith("orig"))
