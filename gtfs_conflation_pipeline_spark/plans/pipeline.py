"""End-to-end conflation pipeline — the reference's 9 CLI stages re-planned
as checkpointed DataFrame transformations (SURVEY.md §1.4 stage table).

Stage graph (each checkpointed with a per-partition lineage manifest):

  images          the input_hint table (generated fixture; on a real cluster
                  this is the pre-existing Iceberg table)
  osm_segments    the OSM/conflation-map side (stage 6 analog)
  geo_shapes      stage 2: shape points -> polylines (groupBy + collect_list)
  geo_stops       stage 2: stops as typed points
  net_segments    stage 3: stop-snapped stop-to-stop slices (grouped DP kernel;
                  prefers stop_times.shape_dist_traveled when present)
  refined         stage 4: cell-bucketed filter-refine candidate matches
  matches         stage 4+7: greedy interval-cover choice + along ranking
  match_paths     stage 4 Pass-B: graph path choice decomposition
                  (gtfs_shape_shst_match_paths analog)
  cospatiality    stage 7: map_segments_cospatiality pair table (two-sided)
  tiles           stage 9: raster-tile assignment per matched segment

Every stage is resumable: `CheckpointManager.run_stage` skips any stage whose
manifest is complete, so a killed run resumes from the last durable stage
(reference analog: each CLI stage re-runnable from its SQLite files, run:41-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures as FX
from ..checkpoint import CheckpointManager
from ..functions import udfs as U
from ..operators import graph_paths, scoring, snap, spatial_join, tiles
from . import schedule


def geo_shapes_from_raw(raw_shapes: DataFrame) -> DataFrame:
    """Stage 2 analog: assemble shape polylines from shape points.

    The ONE unavoidable big shuffle at 10^12 scale (points -> polylines);
    keys are uniform (fixed points per shape) so no salting is needed, and
    AQE sizes the post-shuffle partitions. Everything else is JVM-side
    higher-order array ops; only length/geoprox run as Arrow kernels.
    """
    return (
        raw_shapes.groupBy("shape_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("shape_pt_sequence", "shape_pt_lon", "shape_pt_lat")
                )
            ).alias("pts")
        )
        .select(
            "shape_id",
            F.transform("pts", lambda p: p["shape_pt_lon"]).alias("xs"),
            F.transform("pts", lambda p: p["shape_pt_lat"]).alias("ys"),
        )
        .withColumn("length_km", U.length_km("xs", "ys"))
        .withColumn("cell", U.cell_of(F.element_at("xs", 1), F.element_at("ys", 1), F.lit(spatial_join.CELL_DEG)))
    )


def run_pipeline(
    spark: SparkSession,
    n_images: int,
    ckpt_dir: str,
    partitions: int | None = None,
    verbose: bool = False,
    n_buckets: int = 32,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline over the synthetic image fixture;
    returns every stage's DataFrame.

    ``n_buckets`` sizes every bucketed stage table (see run_from_raw): a
    bucketed SCAN is one task per bucket (buckets never split), so size it
    to AT LEAST the target read parallelism — the rule of thumb is
    n_buckets >= executor cores at deployment scale (32 matches local[32];
    a 1000-executor cluster wants 4-16k). Outputs are identical at any
    value (asserted in tests at 8 vs 64)."""
    ckpt = CheckpointManager(ckpt_dir, verbose=verbose)
    out: dict[str, DataFrame] = {}

    out["images"] = ckpt.run_stage(
        spark,
        "images",
        lambda: FX.images_table(spark, n_images, partitions=partitions),
    )
    out["osm_segments"] = ckpt.run_stage(
        spark,
        "osm_segments",
        lambda: FX.osm_segments_table(spark, n_images, partitions=partitions),
        bucket_by=["segment_id"],
        n_buckets=n_buckets,
    )
    raw = FX.raw_tables(spark, out["images"])
    # checkpoint the relational raw tables (tiny): downstream schedule stages
    # re-read them cheaply, and each stage's parquet inputs are independently
    # readable by external engines (the DuckDB stage oracles read these)
    for name in ("trips", "stop_times", "routes", "calendar", "calendar_dates", "feed_info"):
        raw[name] = ckpt.run_stage(spark, f"raw_{name}", lambda n=name: raw[n])
    out.update(run_from_raw(spark, raw, out["osm_segments"], ckpt, n_buckets=n_buckets))
    return out


def run_from_raw(
    spark: SparkSession,
    raw: dict[str, DataFrame],
    osm_segments: DataFrame,
    ckpt: CheckpointManager,
    upto: str | None = None,
    n_buckets: int = 32,
) -> dict[str, DataFrame]:
    """Stages 2-9 over ANY raw GTFS tables + OSM segment table — the entry
    point a user of the reference CLI migrates to (cli.py wraps this).
    `upto` names a stage after which to stop (per-stage CLI semantics)."""
    out: dict[str, DataFrame] = {"osm_segments": osm_segments}

    def done(stage: str) -> bool:
        return upto is not None and stage == upto

    out["geo_shapes"] = ckpt.run_stage(
        spark,
        "geo_shapes",
        lambda: geo_shapes_from_raw(raw["shapes"]),
        cell_col="cell",
        rows_in_from="images",
    )
    out["geo_stops"] = ckpt.run_stage(
        spark, "geo_stops", lambda: raw["stops"], rows_in_from="images"
    )
    if done("geo_stops"):
        return out

    def _net() -> DataFrame:
        sws = snap.shapes_with_stop_sequences(
            out["geo_shapes"], out["geo_stops"], raw["trips"], raw["stop_times"]
        )
        return snap.snap_and_slice(sws)

    def _net_metrics(df: DataFrame) -> dict:
        # slice-boundary provenance (shape_dist_traveled vs geometric snap;
        # 'fallback' = failed the reference's +-10% unit sanity invariant)
        # + the stop-sequence conflict counter (reference generators.js:207-227
        # throws; we collapse deterministically and COUNT)
        src = {r["dist_source"]: r["count"] for r in df.groupBy("dist_source").count().collect()}
        conflicts = snap.stop_sequence_conflicts(raw["trips"], raw["stop_times"]).count()
        return {"dist_source": src, "stop_sequence_conflicts": conflicts}

    # net_segments / refined / matches / scheduled_traffic are written
    # BUCKETED on shape_id (co-located storage, sources.bucketed): every
    # downstream equi-join or groupBy whose keys include shape_id — the
    # refined x g_len attach, the choose-stage collect_list + rank window,
    # and the probe_data traffic x matches join — then runs with NO
    # Exchange (HashPartitioning on a subset of the clustering keys
    # satisfies the distribution). Asserted by
    # tests/test_pipeline_e2e.py::test_pipeline_stage_joins_are_shuffle_free.
    out["net_segments"] = ckpt.run_stage(
        spark,
        "net_segments",
        _net,
        metrics_fn=_net_metrics,
        rows_in_from="geo_shapes",
        bucket_by=["shape_id"],
        n_buckets=n_buckets,
        sort_by=["shape_id", "shape_index"],
    )
    if done("net_segments"):
        return out

    # filter-refine output is its own stage: BOTH choosers (the greedy
    # interval cover and the full Pass-B graph chooser) consume it, so the
    # expensive corridor refine runs exactly once
    def _refined() -> DataFrame:
        return spatial_join.refine(
            spatial_join.candidate_pairs(out["net_segments"], out["osm_segments"])
        )

    out["refined"] = ckpt.run_stage(
        spark,
        "refined",
        _refined,
        rows_in_from="net_segments",
        bucket_by=["shape_id"],
        n_buckets=n_buckets,
        sort_by=["shape_id", "shape_index"],
    )

    def _matches() -> DataFrame:
        g_len = out["net_segments"].select(
            "shape_id", "shape_index", F.col("length_km").alias("g_len_km")
        )
        return spatial_join.choose_matches(
            out["refined"].join(g_len, ["shape_id", "shape_index"])
        )

    out["matches"] = ckpt.run_stage(
        spark,
        "matches",
        _matches,
        metrics_fn=lambda df: {
            "matched_segments": df.select("shape_id", "shape_index")
            .distinct()
            .count()
        },
        rows_in_from="refined",
        bucket_by=["shape_id"],
        n_buckets=n_buckets,
        sort_by=["shape_id", "shape_index"],
    )

    # Pass-B graph path choice over the same refined candidates — the
    # reference's gtfs_shape_shst_match_paths table
    # (GtfsOsmNetworkDAO/loaders.js:88-157)
    out["match_paths"] = ckpt.run_stage(
        spark,
        "match_paths",
        lambda: graph_paths.match_paths_table(
            out["refined"], out["net_segments"], out["osm_segments"]
        ),
        rows_in_from="refined",
    )

    out["tiles"] = ckpt.run_stage(
        spark,
        "tiles",
        lambda: tiles.assign_tiles(out["matches"], out["osm_segments"]),
        cell_col="tile_id",
        rows_in_from="matches",
    )
    # stage-7 standalone cospatiality pair table over the conflation map
    # (map_segments_cospatiality, createTableFns.js:3-24)
    out["cospatiality"] = ckpt.run_stage(
        spark,
        "cospatiality",
        lambda: spatial_join.map_segments_cospatiality(out["osm_segments"]),
        rows_in_from="osm_segments",
    )
    if done("tiles"):
        return out

    out["match_scores"] = ckpt.run_stage(
        spark,
        "match_scores",
        lambda: scoring.score_matches(
            out["matches"], out["net_segments"], out["osm_segments"]
        ),
        rows_in_from="matches",
    )
    if done("match_scores"):
        return out

    # schedule side (reference stages 5 + 8)
    out["service_dates"] = ckpt.run_stage(
        spark,
        "service_dates",
        lambda: schedule.service_dates(raw["calendar"], raw["calendar_dates"]),
    )
    def _traffic_metrics(df: DataFrame) -> dict:
        # feed-level row-count reconciliation (the reference's runtime
        # invariant, GtfsScheduledTrafficDAO/loaders.js:86-104): every trip
        # with S stop visits should produce S-1 spans; shortfall = spans
        # dropped by segment-join misses / degenerate slices. Recorded, not
        # thrown — inspect the manifest when it drifts.
        n_spans = df.count()
        n_st = raw["stop_times"].count()
        n_trips = raw["trips"].select("trip_id").distinct().count()
        return {
            "spans": n_spans,
            "expected_spans": n_st - n_trips,
            "reconciliation_shortfall": (n_st - n_trips) - n_spans,
        }

    out["scheduled_traffic"] = ckpt.run_stage(
        spark,
        "scheduled_traffic",
        lambda: schedule.scheduled_traffic(
            raw["trips"], raw["stop_times"], out["net_segments"]
        ),
        metrics_fn=_traffic_metrics,
        bucket_by=["shape_id"],
        n_buckets=n_buckets,
    )
    if done("scheduled_traffic"):
        return out
    out["probe_data"] = ckpt.run_stage(
        spark,
        "probe_data",
        lambda: schedule.probe_data(out["scheduled_traffic"], out["matches"]),
        rows_in_from="scheduled_traffic",
        # segment_id leads every downstream traffic grouping key, so the
        # traffic_by_route aggregation consumes the buckets in place
        bucket_by=["segment_id"],
        n_buckets=n_buckets,
    )
    out["traffic_by_route"] = ckpt.run_stage(
        spark,
        "traffic_by_route",
        lambda: schedule.traffic_by_route(
            out["probe_data"], raw["routes"], out["service_dates"], raw["feed_info"]
        ),
        rows_in_from="probe_data",
    )
    out["traffic"] = ckpt.run_stage(
        spark, "traffic", lambda: schedule.traffic_overall(out["traffic_by_route"])
    )
    out["aadt"] = ckpt.run_stage(
        spark, "aadt", lambda: schedule.aadt_breakdown(out["traffic_by_route"])
    )
    return out
