"""Schedule side — reference stages 5 and 8 re-planned as DataFrame ops.

Stage 5 (`scheduled_bus_traffic`, GtfsScheduledTrafficDAO):
  service_dates        calendar dow-flags x date-series join, plus
                       calendar_dates add (UNION) / remove (EXCEPT)
                       exceptions (createTableFns.js:341-474)
  scheduled_traffic    per trip, each consecutive stop-time pair mapped to
                       its shape segment span with departure/arrival times
                       (TripTracker.js:70-289 — our net segments are
                       stop-to-stop, so the FIFO bookkeeping reduces to a
                       lead() window + equi-join on (shape, from, to))

Stage 8 (`gtfs_conflation_schedule_join`, GtfsConflationScheduleJoinDAO):
  probe_data           RANGE JOIN traffic x chosen matches ON shape_id AND
                       dptr_seg_idx <= shape_index < arvl_seg_idx
                       (loaders.js:186-195), then travel time distributed
                       over matched segments by length/speedlimit weight
                       (loaders.js:58-67, 218-263) — the weight math is
                       higher-order column expressions, zero Python
  traffic_by_route     AVG travel time + weekly-normalized counts per
                       (segment, route, dow, epoch) (createTableFns.js:51-78)
  traffic              weighted average across routes (createTableFns.js:80-105)
  aadt_breakdown       three grains re-joined wide with peak-period CASE
                       (createTableFns.js:108-202)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# networklevel -> avg posted speed mph — the reference's
# networklevelAvgPostedSpeedlimt table (loaders.js:58-67); levels >= 8 and
# missing levels fall back to the reference's `|| 30` default.
SPEED_BY_NETWORKLEVEL = {
    0: 57.5, 1: 44.9, 2: 41.6, 3: 41.7, 4: 39.5, 5: 33.5, 6: 40.8, 7: 31.9
}
DEFAULT_SPEED_MPH = 30.0

DOW_COLS = ["sunday", "monday", "tuesday", "wednesday", "thursday", "friday", "saturday"]


def service_dates(calendar: DataFrame, calendar_dates: DataFrame) -> DataFrame:
    """(service_id, date, dow) for every active service day.

    Date series via sequence+explode (the reference's recursive CTE,
    createTableFns.js:341-376); dow-flag membership via element_at on the
    packed flag array; add/remove exceptions via union/anti-join
    (:443-474)."""
    cal = calendar.withColumn(
        "dows", F.array(*[F.col(c) for c in DOW_COLS])
    ).withColumn(
        "days",
        F.explode(
            F.sequence(
                F.to_date("start_date", "yyyyMMdd"), F.to_date("end_date", "yyyyMMdd")
            )
        ),
    )
    base = cal.filter(
        F.element_at("dows", F.dayofweek("days")) == 1
    ).select("service_id", F.col("days").alias("date"))

    added = calendar_dates.filter(F.col("exception_type") == 1).select(
        "service_id", F.to_date("date", "yyyyMMdd").alias("date")
    )
    removed = calendar_dates.filter(F.col("exception_type") == 2).select(
        "service_id", F.to_date("date", "yyyyMMdd").alias("date")
    )
    return (
        base.union(added)
        .distinct()
        .join(removed, ["service_id", "date"], "left_anti")
        .select(
            "service_id", "date", (F.dayofweek("date") - 1).alias("dow")
        )
    )


def _hhmmss_to_sec(col):
    """GTFS HH:MM:SS (hours may exceed 23) -> seconds into service day
    (TripTracker.js:13-17)."""
    p = F.split(col, ":")
    return (
        p.getItem(0).cast("int") * 3600
        + p.getItem(1).cast("int") * 60
        + p.getItem(2).cast("int")
    )


def scheduled_traffic(
    trips: DataFrame, stop_times: DataFrame, net_segments: DataFrame
) -> DataFrame:
    """One row per (trip, traversed stop-to-stop span):
    (trip_id, route_id, service_id, shape_id, dptr_seg_idx, arvl_seg_idx,
    dptr_time_sec, arvl_time_sec).

    lead() over stop_sequence forms the span (the reference's per-stop FIFO
    state machine reduces to this because our net segments are stop-keyed);
    joining net_segments on (shape_id, from_stop, to_stop) resolves the
    segment index span. Trips that skip stops produce multi-segment spans
    resolved by the from-stop segment and the segment BEFORE the to-stop.
    """
    w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    spans = (
        stop_times.select(
            "trip_id",
            "stop_id",
            "stop_sequence",
            _hhmmss_to_sec(F.col("departure_time")).alias("dptr_time_sec"),
            F.lead("stop_id").over(w).alias("next_stop_id"),
            _hhmmss_to_sec(F.lead("arrival_time").over(w)).alias("arvl_time_sec"),
        )
        .filter(F.col("next_stop_id").isNotNull())
        # duplicate stop_times rows (same stop twice in a row) are dwell
        # time, not a traversal: drop the degenerate span BEFORE visit
        # ranking so it doesn't consume a FIFO occurrence (the reference
        # reconciles these away, GtfsScheduledTrafficDAO/loaders.js:86-104)
        .filter(F.col("next_stop_id") != F.col("stop_id"))
    )
    # loop shapes: the reference's per-stop FIFO (TripTracker.js:70-289)
    # consumes repeated stop occurrences IN ORDER — a trip's Nth visit of a
    # stop maps to the shape's Nth segment occurrence of that stop, so rank
    # both sides by visit/occurrence number and join on it.
    w_visit_from = Window.partitionBy("trip_id", "stop_id").orderBy("stop_sequence")
    w_visit_to = Window.partitionBy("trip_id", "next_stop_id").orderBy("stop_sequence")
    spans = spans.withColumn("from_visit", F.row_number().over(w_visit_from)).withColumn(
        "to_visit", F.row_number().over(w_visit_to)
    )
    t = trips.select("trip_id", "route_id", "service_id", "shape_id")
    w_occ_from = Window.partitionBy("shape_id", "from_stop_id").orderBy("shape_index")
    w_occ_to = Window.partitionBy("shape_id", "to_stop_id").orderBy("shape_index")
    seg_from = net_segments.select(
        "shape_id",
        F.col("from_stop_id").alias("stop_id"),
        F.col("shape_index").alias("dptr_seg_idx"),
        F.row_number().over(w_occ_from).alias("from_visit"),
    )
    seg_to = net_segments.select(
        "shape_id",
        F.col("to_stop_id").alias("next_stop_id"),
        (F.col("shape_index") + 1).alias("arvl_seg_idx"),
        F.row_number().over(w_occ_to).alias("to_visit"),
    )
    joined = (
        spans.join(t, "trip_id")
        .join(seg_from, ["shape_id", "stop_id", "from_visit"])
        .join(seg_to, ["shape_id", "next_stop_id", "to_visit"])
        .filter(F.col("arvl_seg_idx") > F.col("dptr_seg_idx"))
    )
    # safety dedupe (visit-matched joins are 1:1; keep deterministic anyway)
    w_span = Window.partitionBy("trip_id", "stop_sequence").orderBy(
        "dptr_seg_idx", "arvl_seg_idx"
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w_span))
        .filter(F.col("_rn") == 1)
        .select(
            "trip_id",
            "route_id",
            "service_id",
            "shape_id",
            "dptr_seg_idx",
            "arvl_seg_idx",
            "dptr_time_sec",
            "arvl_time_sec",
        )
    )


def probe_data(traffic: DataFrame, matches: DataFrame) -> DataFrame:
    """Stage-8 range join + travel-time distribution.

    RANGE JOIN: equi on shape_id plus the BETWEEN predicate on segment
    index (the reference's hot-key join; AQE skew-join handles popular
    shapes). Travel time for a span is distributed across its matched
    conflation segments proportionally to length/speed weight, with
    per-segment cumulative departure offsets (loaders.js:218-263) — all
    higher-order array expressions, no Python.

    Output: (trip_id, route_id, service_id, segment_id, shst_reference,
    dptr_time_sec, arvl_time_sec, travel_time_sec, epoch).
    """
    speed_map = F.create_map(
        *[F.lit(x) for kv in SPEED_BY_NETWORKLEVEL.items() for x in kv]
    )
    m = matches.select(
        "shape_id",
        "shape_index",
        "segment_id",
        "shst_reference",
        "along_idx",
        (
            F.col("intxn_len_km")
            / F.coalesce(
                speed_map[F.col("networklevel")].cast("double"),
                F.lit(DEFAULT_SPEED_MPH),
            )
        ).alias("weight"),
    )
    joined = traffic.join(m, "shape_id").filter(
        (F.col("dptr_seg_idx") <= F.col("shape_index"))
        & (F.col("shape_index") < F.col("arvl_seg_idx"))
    )
    per_span = joined.groupBy(
        "trip_id",
        "route_id",
        "service_id",
        "shape_id",
        "dptr_seg_idx",
        "arvl_seg_idx",
        "dptr_time_sec",
        "arvl_time_sec",
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct("shape_index", "along_idx", "segment_id", "shst_reference", "weight")
            )
        ).alias("segs")
    )
    total_w = F.aggregate(
        F.col("segs"), F.lit(0.0), lambda a, s: a + s["weight"]
    )
    span_tt = F.col("arvl_time_sec") - F.col("dptr_time_sec")
    # prefix-sum of weights (O(n^2) higher-order expr; spans are short)
    idx = F.sequence(F.lit(1), F.size("segs"))
    rows = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("segs", i).alias("seg"),
            F.aggregate(
                F.slice("segs", F.lit(1), i - 1), F.lit(0.0), lambda a, s: a + s["weight"]
            ).alias("w_before"),
        ),
    )
    out = per_span.select(
        "trip_id",
        "route_id",
        "service_id",
        "dptr_time_sec",
        "arvl_time_sec",
        total_w.alias("total_w"),
        span_tt.alias("span_tt"),
        F.explode(rows).alias("r"),
    )
    seg = F.col("r.seg")
    frac = F.when(F.col("total_w") > 0, seg["weight"] / F.col("total_w")).otherwise(0.0)
    start_frac = F.when(
        F.col("total_w") > 0, F.col("r.w_before") / F.col("total_w")
    ).otherwise(0.0)
    seg_dptr = F.col("dptr_time_sec") + start_frac * F.col("span_tt")
    per_seg = out.select(
        "trip_id",
        "route_id",
        "service_id",
        seg["segment_id"].alias("segment_id"),
        seg["shst_reference"].alias("shst_reference"),
        seg_dptr.alias("_seg_dptr"),
        (frac * F.col("span_tt")).alias("_tt"),
        F.floor(seg_dptr / 300).cast("int").alias("epoch"),
    )
    # Reference grain: PK (conflation_map_id, trip_id, epoch) on
    # gtfs_synthetic_probe_data — a segment matched by two adjacent
    # stop-to-stop spans in the same epoch is ONE probe row with the travel
    # times summed (loaders.js:218-263), not two rows.
    return per_seg.groupBy(
        "trip_id", "route_id", "service_id", "segment_id", "shst_reference", "epoch"
    ).agg(
        F.round(F.min("_seg_dptr")).cast("long").alias("seg_dptr_sec"),
        F.round(F.sum("_tt"), 3).alias("travel_time_sec"),
    ).select(
        "trip_id",
        "route_id",
        "service_id",
        "segment_id",
        "shst_reference",
        "seg_dptr_sec",
        "travel_time_sec",
        "epoch",
    )


def feed_weeks(feed_info: DataFrame) -> DataFrame:
    """Feed extent in weeks (julianday diff / 7, createTableFns.js:28-49)."""
    return feed_info.select(
        (
            F.datediff(
                F.to_date("feed_end_date", "yyyyMMdd"),
                F.to_date("feed_start_date", "yyyyMMdd"),
            )
            / 7.0
        ).alias("feed_num_weeks")
    )


def traffic_by_route(
    probes: DataFrame,
    routes: DataFrame,
    svc_dates: DataFrame,
    feed_info: DataFrame,
) -> DataFrame:
    """AVG travel time + weekly-normalized trip count per
    (segment, route, dow, epoch) — createTableFns.js:22-79.

    Reference semantics: probes join service_dates PER DATE (each scheduled
    run is replicated across every active service date, so a Monday-only
    service over a 4-week feed contributes 4 rows) and the count is divided
    by the feed extent in weeks; routes joins in route_short_name."""
    per_date = svc_dates.select("service_id", "date", "dow")
    weeks = feed_weeks(feed_info)
    route_dim = F.broadcast(routes.select("route_id", "route_short_name"))
    return (
        probes.join(per_date, "service_id")
        .join(route_dim, "route_id")
        .crossJoin(F.broadcast(weeks))
        .groupBy("segment_id", "shst_reference", "route_short_name", "dow", "epoch")
        .agg(
            F.round(F.avg("travel_time_sec"), 3).alias("avg_tt_sec"),
            F.round(F.count(F.lit(1)) / F.max("feed_num_weeks"), 1).alias(
                "avg_weekly_count"
            ),
        )
    )


def traffic_overall(by_route: DataFrame) -> DataFrame:
    """Weighted average across routes per (segment, dow, epoch)
    (SUM(tt*w)/SUM(w), createTableFns.js:80-105)."""
    return by_route.groupBy("segment_id", "shst_reference", "dow", "epoch").agg(
        F.round(
            F.sum(F.col("avg_tt_sec") * F.col("avg_weekly_count"))
            / F.sum("avg_weekly_count"),
            3,
        ).alias("avg_tt_sec"),
        F.round(F.sum("avg_weekly_count"), 1).alias("avg_weekly_count"),
    )


PEAK_CLASSES = ["AMP", "MIDD", "PMP", "WE", "OVN"]


def peak_class():
    """The reference's peak CASE (createTableFns.js:121-137): day window
    6-20h on weekdays splits AMP 6-10h / MIDD 10-16h / PMP 16-20h; weekend
    day hours are WE; everything outside 6-20h is OVN."""
    e = F.col("epoch")
    weekday = F.col("dow").between(1, 5)
    day = e.between(6 * 12, 20 * 12 - 1)
    return (
        F.when(
            day & weekday,
            F.when(e.between(6 * 12, 10 * 12 - 1), F.lit("AMP"))
            .when(e.between(10 * 12, 16 * 12 - 1), F.lit("MIDD"))
            .otherwise(F.lit("PMP")),
        )
        .when(day, F.lit("WE"))
        .otherwise(F.lit("OVN"))
    )


def aadt_breakdown(by_route: DataFrame) -> DataFrame:
    """AADT rollup per segment with the reference's peak classes
    (createTableFns.js:108-201): per (segment, peak, route) aadt =
    round(sum(avg_weekly_count)/7); wide row = total + per-peak pivot +
    route count (the reference's JSON pivots as typed columns)."""
    grain = (
        by_route.withColumn("peak", peak_class())
        .groupBy("segment_id", "peak", "route_short_name")
        .agg(F.round(F.sum("avg_weekly_count") / 7.0).alias("aadt"))
    )
    total = grain.groupBy("segment_id").agg(F.sum("aadt").alias("aadt"))
    by_peak = (
        grain.groupBy("segment_id", "peak")
        .agg(F.sum("aadt").alias("c"))
        .groupBy("segment_id")
        .pivot("peak", PEAK_CLASSES)
        .agg(F.first("c"))
        .select(
            "segment_id",
            *[
                F.coalesce(p, F.lit(0.0)).alias(f"aadt_{p.lower()}")
                for p in PEAK_CLASSES
            ],
        )
    )
    n_routes = grain.groupBy("segment_id").agg(
        F.count_distinct("route_short_name").alias("n_routes")
    )
    return total.join(by_peak, "segment_id").join(n_routes, "segment_id")
