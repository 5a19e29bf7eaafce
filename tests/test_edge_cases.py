"""Adversarial edge cases the reference guards against (FIXTURES.md §3,
SURVEY.md §5.4): duplicate coords, shared-point stops, skipped stops,
duplicate stop_times, unit inference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import kernels as K
from gtfs_conflation_pipeline_spark.operators import snap
from gtfs_conflation_pipeline_spark.plans import schedule


def test_units_inference_all_units():
    km = 12.0
    for unit, val in [("km", 12.01), ("m", 12010.0), ("mi", 12.0 / 1.60934), ("ft", 12.0 / 1.60934 * 5280)]:
        scale, got = K.infer_dist_units_to_km(val, km)
        assert got == unit
        assert val * scale == pytest.approx(km, rel=0.01)


def test_units_inference_failure_and_null():
    with pytest.raises(ValueError):
        # 2x the shape length in km: nearest unit is km but off by 100%
        K.infer_dist_units_to_km(24.0, 12.0)
    assert K.infer_dist_units_to_km(None, 12.0) == (None, None)
    assert K.infer_dist_units_to_km(float("nan"), 12.0) == (None, None)


def test_duplicate_consecutive_coords_dropped_in_slices():
    xs = np.array([-74.0, -74.0, -73.995, -73.995, -73.99])
    ys = np.array([42.0, 42.0, 42.0, 42.0, 42.0])
    sx, sy = K.line_slice_along(xs, ys, 0.0, K.polyline_length_km(xs, ys))
    d = np.hypot(np.diff(sx), np.diff(sy))
    assert (d > 0).all()  # removeRedundantCoords semantics


def test_stops_snapping_to_same_point_drop_degenerate_slice(spark):
    """Two stops at the same location -> zero-length slice dropped
    (reference TripTracker shared-coord stops, FIFO case)."""
    xs = [float(x) for x in np.round(np.linspace(-74.0, -73.98, 21), 6)]
    ys = [42.0] * 21
    sws = spark.createDataFrame(
        [(
            "s",
            xs,
            ys,
            ["a", "b", "b2", "c"],
            [-74.0, -73.99, -73.99, -73.98],  # b and b2 identical
            [42.0, 42.0, 42.0, 42.0],
        )],
        "shape_id string, xs array<double>, ys array<double>, stop_ids array<string>,"
        " stop_lons array<double>, stop_lats array<double>",
    )
    segs = snap.snap_and_slice(sws).orderBy("shape_index").collect()
    # 4 stops -> 3 potential slices; the b->b2 slice is degenerate and dropped
    assert len(segs) == 2
    assert [s.from_stop_id for s in segs] == ["a", "b2"]
    assert all(s.length_km > 0 for s in segs)


def _mini_traffic_inputs(spark):
    xs = [float(x) for x in np.round(np.linspace(-74.0, -73.97, 31), 6)]
    ys = [42.0] * 31
    net = spark.createDataFrame(
        [
            ("s", 0, "a", "b", 0.0, 1.0, xs[:11], ys[:11]),
            ("s", 1, "b", "c", 1.0, 1.0, xs[10:21], ys[10:21]),
            ("s", 2, "c", "d", 2.0, 1.0, xs[20:], ys[20:]),
        ],
        "shape_id string, shape_index int, from_stop_id string, to_stop_id string,"
        " start_dist_km double, length_km double, xs array<double>, ys array<double>",
    )
    trips = spark.createDataFrame(
        [("r", "svc", "t1", "0", "s")],
        "route_id string, service_id string, trip_id string, direction_id string, shape_id string",
    )
    return net, trips


def test_trip_skipping_stops_multi_segment_span(spark):
    """A trip visiting a, then d (skipping b, c) produces one span covering
    segment indexes [0, 3) — the range-join BETWEEN case."""
    net, trips = _mini_traffic_inputs(spark)
    st = spark.createDataFrame(
        [
            ("t1", "06:00:00", "06:00:00", "a", 1, None),
            ("t1", "06:30:00", "06:30:00", "d", 2, None),
        ],
        "trip_id string, arrival_time string, departure_time string, stop_id string,"
        " stop_sequence int, shape_dist_traveled double",
    )
    tr = schedule.scheduled_traffic(trips, st, net).collect()
    assert len(tr) == 1
    assert tr[0].dptr_seg_idx == 0 and tr[0].arvl_seg_idx == 3
    assert tr[0].arvl_time_sec - tr[0].dptr_time_sec == 1800


def test_duplicate_stop_times_rows_produce_no_degenerate_spans(spark):
    """Duplicate stop_times rows (same stop twice in a row) must not create
    zero-length spans (reference reconciles COUNT vs COUNT DISTINCT,
    GtfsScheduledTrafficDAO/loaders.js:86-104)."""
    net, trips = _mini_traffic_inputs(spark)
    st = spark.createDataFrame(
        [
            ("t1", "06:00:00", "06:00:00", "a", 1, None),
            ("t1", "06:10:00", "06:10:00", "b", 2, None),
            ("t1", "06:10:00", "06:10:00", "b", 3, None),  # duplicate visit
            ("t1", "06:20:00", "06:20:00", "c", 4, None),
        ],
        "trip_id string, arrival_time string, departure_time string, stop_id string,"
        " stop_sequence int, shape_dist_traveled double",
    )
    tr = schedule.scheduled_traffic(trips, st, net).orderBy("dptr_seg_idx").collect()
    spans = [(r.dptr_seg_idx, r.arvl_seg_idx) for r in tr]
    assert spans == [(0, 1), (1, 2)]  # b->b dropped, a->b and b->c kept

# ---------------------------------------------------------------------------
# shape_dist_traveled wiring (reference prefers it over geometric snapping,
# GeoJsonGtfsDAO/generators.js:19-94)
# ---------------------------------------------------------------------------


def _dist_feed(spark, dists):
    """One straight shape, 3 stops; the MIDDLE stop's coordinates sit at the
    50% point but shape_dist_traveled claims 25% — so the slice boundary
    reveals which source was used."""
    xs = [float(x) for x in np.round(np.linspace(-74.0, -73.98, 21), 6)]
    ys = [42.0] * 21
    geo_shapes = spark.createDataFrame(
        [("s", xs, ys)], "shape_id string, xs array<double>, ys array<double>"
    )
    geo_stops = spark.createDataFrame(
        [("a", xs[0], 42.0), ("b", xs[10], 42.0), ("c", xs[20], 42.0)],
        "stop_id string, stop_lon double, stop_lat double",
    )
    trips = spark.createDataFrame(
        [("r", "svc", "t1", "0", "s")],
        "route_id string, service_id string, trip_id string, direction_id string,"
        " shape_id string",
    )
    stop_times = spark.createDataFrame(
        [
            ("t1", "06:00:00", "06:00:00", "a", 1, dists[0]),
            ("t1", "06:05:00", "06:05:00", "b", 2, dists[1]),
            ("t1", "06:10:00", "06:10:00", "c", 3, dists[2]),
        ],
        "trip_id string, arrival_time string, departure_time string, stop_id string,"
        " stop_sequence int, shape_dist_traveled double",
    )
    return snap.snap_and_slice(
        snap.shapes_with_stop_sequences(geo_shapes, geo_stops, trips, stop_times)
    ), K.polyline_length_km(np.asarray(xs), np.asarray(ys))


@pytest.mark.parametrize("unit,per_km", [("km", 1.0), ("m", 1000.0), ("mi", 1/1.60934), ("ft", 5280/1.60934)])
def test_shape_dist_traveled_preferred_over_geometry(spark, unit, per_km):
    """With monotone finite shape_dist_traveled, slice boundaries come from
    the (unit-inferred) dist values, not the geometric snap: the middle
    boundary lands at the claimed 25%, not the geometric 50%."""
    segs = None
    import numpy as _np

    # we only know total after building; build once with km then rescale
    xs = _np.round(_np.linspace(-74.0, -73.98, 21), 6)
    total = K.polyline_length_km(xs, _np.full(21, 42.0))
    dists = [0.0, 0.25 * total * per_km, total * per_km]
    df, total2 = _dist_feed(spark, dists)
    segs = df.orderBy("shape_index").collect()
    assert len(segs) == 2
    assert all(s.dist_source == "dist" for s in segs)
    assert segs[0].length_km == pytest.approx(0.25 * total, rel=0.01)
    assert segs[1].length_km == pytest.approx(0.75 * total, rel=0.01)


def test_shape_dist_traveled_sanity_fallback(spark):
    """A last dist that misses every unit interpretation by >10% (the
    reference's generators.js:84-88 throw) degrades to geometric snapping
    with dist_source='fallback'."""
    xs = np.round(np.linspace(-74.0, -73.98, 21), 6)
    total = K.polyline_length_km(xs, np.full(21, 42.0))
    df, _ = _dist_feed(spark, [0.0, 0.5 * total, 2.0 * total])
    segs = df.orderBy("shape_index").collect()
    assert len(segs) == 2
    assert all(s.dist_source == "fallback" for s in segs)
    # geometric: middle stop snaps at its true 50% location
    assert segs[0].length_km == pytest.approx(0.5 * total, rel=0.01)


def test_null_dists_use_geometry(spark):
    df, _ = _dist_feed(spark, [None, None, None])
    segs = df.orderBy("shape_index").collect()
    assert all(s.dist_source == "geom" for s in segs)


def test_stop_sequence_conflict_counter(spark):
    """Two trips on one shape with DIFFERENT stop orders: the reference
    throws (generators.js:207-227); the engine collapses deterministically
    and the conflict surface reports the shape."""
    trips = spark.createDataFrame(
        [("r", "svc", "t1", "0", "s"), ("r", "svc", "t2", "0", "s")],
        "route_id string, service_id string, trip_id string, direction_id string,"
        " shape_id string",
    )
    rows = [
        ("t1", "a", 1), ("t1", "b", 2), ("t1", "c", 3),
        ("t2", "a", 1), ("t2", "c", 2), ("t2", "b", 3),  # conflicting order
    ]
    stop_times = spark.createDataFrame(
        rows, "trip_id string, stop_id string, stop_sequence int"
    )
    c = snap.stop_sequence_conflicts(trips, stop_times).collect()
    assert len(c) == 1 and c[0].shape_id == "s" and c[0].n_sequences == 2
