"""Schedule-side invariants — ports of the reference's runtime assertions
(SURVEY.md §5.4): monotonic times (TripTracker.js:269-273), row-count
reconciliation (GtfsScheduledTrafficDAO/loaders.js:86-104), travel-time
conservation, calendar exception semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.plans.pipeline import run_pipeline

N = 1000


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sched_ckpt"))
    return run_pipeline(spark, N, d, partitions=8)


def test_service_dates_calendar_semantics(pipe):
    sd = pipe["service_dates"].toPandas()
    wk = sd[sd.service_id == "svc_wk"]
    we = sd[sd.service_id == "svc_we"]
    # weekday service: Mon-Fri only, except the removed exception date;
    # weekend service gained one added weekday date
    assert set(wk.dow) <= {1, 2, 3, 4, 5}
    assert datetime.date(2024, 1, 15) not in set(wk.date)  # exception_type=2
    assert datetime.date(2024, 1, 16) in set(we.date)  # exception_type=1
    # 4 weeks of Mon-Fri in Jan 1-28 = 20 days, minus the removed one
    assert len(wk) == 19


def test_scheduled_traffic_counts_and_monotonic_times(pipe):
    tr = pipe["scheduled_traffic"]
    n_trips = pipe["images"].count() // FX.PTS_PER_SHAPE * FX.TRIPS_PER_SHAPE
    spans_per_trip = FX.PTS_PER_SHAPE // FX.STOP_EVERY - 1
    assert tr.count() == n_trips * spans_per_trip
    # reconciliation: every span belongs to a known trip exactly once
    assert (
        tr.groupBy("trip_id").count().filter(F.col("count") != spans_per_trip).count()
        == 0
    )
    # monotonic times (TripTracker.js:269-273)
    assert tr.filter(F.col("arvl_time_sec") <= F.col("dptr_time_sec")).count() == 0


def test_probe_travel_time_conservation(pipe, spark):
    """Distributed per-segment travel times must re-sum to the span time
    for every (trip, span) that matched at least one segment."""
    from gtfs_conflation_pipeline_spark.plans.schedule import probe_data

    probes = pipe["probe_data"]
    spans = pipe["scheduled_traffic"].withColumn(
        "span_tt", F.col("arvl_time_sec") - F.col("dptr_time_sec")
    )
    summed = probes.groupBy("trip_id", "seg_dptr_sec").agg(
        F.sum("travel_time_sec").alias("tt")
    )
    # per trip: total distributed time == total span time (rounding 3dp x #segs)
    per_trip = probes.groupBy("trip_id").agg(F.sum("travel_time_sec").alias("tt"))
    span_per_trip = spans.groupBy("trip_id").agg(F.sum("span_tt").alias("tt0"))
    j = per_trip.join(span_per_trip, "trip_id").toPandas()
    # spans with zero matched segments lose their time; everything else conserves
    assert (j.tt <= j.tt0 + 0.1).all()
    covered = j[j.tt > 0]
    assert len(covered) > 0


def test_probe_epochs_valid(pipe):
    p = pipe["probe_data"]
    assert p.filter((F.col("epoch") < 0) | (F.col("epoch") > 287)).count() == 0


def test_aadt_grains_reconcile(pipe):
    a = pipe["aadt"].toPandas()
    assert len(a) > 0
    peaks = a.aadt_amp + a.aadt_midd + a.aadt_pmp + a.aadt_we + a.aadt_ovn
    assert (abs(a.aadt - peaks) < 1e-9).all()
    assert (a.n_routes >= 1).all()
    # fixture trips run 06:00-09:25: weekday probes land in AMP, weekend in WE
    assert (a.aadt_amp + a.aadt_we > 0).any()
    assert (a.aadt_midd == 0).all() and (a.aadt_ovn == 0).all()


def test_weekly_count_reference_semantics(pipe):
    """Reference: count is per service DATE / feed weeks — the removed
    Monday exception (2024-01-15) must make Monday's weekly count smaller
    than Tuesday's for the weekday service (createTableFns.js:22-79)."""
    br = pipe["traffic_by_route"].toPandas()
    mon = br[br.dow == 1].avg_weekly_count
    tue = br[br.dow == 2].avg_weekly_count
    assert len(mon) and len(tue)
    # 3 active Mondays vs 4 Tuesdays over a 3.857-week feed
    assert mon.max() < tue.max()
    assert tue.max() == pytest.approx(4 / (27 / 7.0), abs=0.06)


def test_loop_shape_fifo_visit_matching(spark):
    """A trip traversing a loop shape visits stop A twice; the reference's
    TripTracker FIFO consumes segment occurrences in order, so the SECOND
    visit of A must map to the shape's SECOND A-departure segment — not the
    first (which would produce a backwards span)."""
    from gtfs_conflation_pipeline_spark.plans.schedule import scheduled_traffic

    trips = spark.createDataFrame(
        [("t1", "r1", "svc", "S")], "trip_id string, route_id string, service_id string, shape_id string"
    )
    stop_times = spark.createDataFrame(
        [
            ("t1", "A", 1, "06:00:00", "06:00:00"),
            ("t1", "B", 2, "06:05:00", "06:05:00"),
            ("t1", "A", 3, "06:10:00", "06:10:00"),
            ("t1", "C", 4, "06:15:00", "06:15:00"),
        ],
        "trip_id string, stop_id string, stop_sequence int, departure_time string, arrival_time string",
    )
    net_segments = spark.createDataFrame(
        [("S", 0, "A", "B"), ("S", 1, "B", "A"), ("S", 2, "A", "C")],
        "shape_id string, shape_index int, from_stop_id string, to_stop_id string",
    )
    out = (
        scheduled_traffic(trips, stop_times, net_segments)
        .orderBy("dptr_time_sec")
        .collect()
    )
    assert [(r.dptr_seg_idx, r.arvl_seg_idx) for r in out] == [(0, 1), (1, 2), (2, 3)]


def test_probe_grain_is_segment_trip_epoch(spark):
    """Reference PK (conflation_map_id, trip_id, epoch): a segment matched
    by two adjacent spans in the same epoch yields ONE probe row with the
    travel times summed."""
    from gtfs_conflation_pipeline_spark.plans.schedule import probe_data

    traffic = spark.createDataFrame(
        [
            ("t1", "r1", "svc", "S", 0, 1, 21600, 21660),
            ("t1", "r1", "svc", "S", 1, 2, 21660, 21720),
        ],
        "trip_id string, route_id string, service_id string, shape_id string,"
        " dptr_seg_idx int, arvl_seg_idx int, dptr_time_sec long, arvl_time_sec long",
    )
    # one conflation segment matched across BOTH spans
    matches = spark.createDataFrame(
        [("S", 0, "seg9", "ref9", 0, 0.5, 3), ("S", 1, "seg9", "ref9", 0, 0.5, 3)],
        "shape_id string, shape_index int, segment_id string, shst_reference string,"
        " along_idx int, intxn_len_km double, networklevel int",
    )
    rows = probe_data(traffic, matches).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.segment_id == "seg9" and r.epoch == 72
    assert r.travel_time_sec == pytest.approx(120.0, abs=1e-3)
    assert r.seg_dptr_sec == 21600


def test_probe_speed_fallback_level7_plus(spark):
    """networklevel >= 8 (absent from the reference table) must fall back to
    30 mph, not NULL out the whole span's weights."""
    from gtfs_conflation_pipeline_spark.plans.schedule import probe_data

    traffic = spark.createDataFrame(
        [("t1", "r1", "svc", "S", 0, 2, 0, 100)],
        "trip_id string, route_id string, service_id string, shape_id string,"
        " dptr_seg_idx int, arvl_seg_idx int, dptr_time_sec long, arvl_time_sec long",
    )
    matches = spark.createDataFrame(
        [("S", 0, "sA", "rA", 0, 1.0, 8), ("S", 1, "sB", "rB", 0, 1.0, 8)],
        "shape_id string, shape_index int, segment_id string, shst_reference string,"
        " along_idx int, intxn_len_km double, networklevel int",
    )
    rows = {r.segment_id: r for r in probe_data(traffic, matches).collect()}
    assert rows["sA"].travel_time_sec == pytest.approx(50.0, abs=1e-3)
    assert rows["sB"].travel_time_sec == pytest.approx(50.0, abs=1e-3)


def test_traffic_weighted_avg_bounds(pipe):
    by_route = pipe["traffic_by_route"].toPandas()
    overall = pipe["traffic"].toPandas()
    assert len(overall) <= len(by_route)
    # weighted avg lies within the min/max of contributing route averages
    import pandas as pd

    g = by_route.groupby(["segment_id", "dow", "epoch"]).avg_tt_sec.agg(["min", "max"])
    m = overall.merge(g, on=["segment_id", "dow", "epoch"])
    assert (m.avg_tt_sec >= m["min"] - 1e-6).all()
    assert (m.avg_tt_sec <= m["max"] + 1e-6).all()
