"""Stage 3 analog — stop-sequence snapping + shape slicing.

Reference: ``./run gtfs_network`` (SURVEY.md §3.1): per GTFS shape, fit the
ordered stop sequence to the shape polyline (greedy, then least-squares DP —
snapGtfsStopsSequenceToGtfsShape.js:33-166), then slice the shape at the
snapped stop positions into stop-to-stop segments with a connectivity patch
(loaders/index.js:104-146).

Spark shape: ONE grouped applyInPandas per shape_id. The algorithm is
shape-local (no cross-shape state), so max parallelism = number of shapes and
the only shuffle is the groupBy(shape_id). Group payloads are bounded
(shapes are <= a few thousand points), so no spill concern at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels as K
from ..functions.udfs import arrow_frame

SEGMENTS_SCHEMA = (
    "shape_id string, shape_index int, from_stop_id string, to_stop_id string, "
    "start_dist_km double, length_km double, xs array<double>, ys array<double>, "
    "dist_source string"
)


def _fit_and_slice(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped kernel: one row in = one shape (xs, ys, stop arrays);
    rows out = its stop-to-stop segments.

    Slice boundary source (reference GeoJsonGtfsDAO/generators.js:19-94
    PREFERS stop_times.shape_dist_traveled over geometric snapping):
      'dist'     — monotone finite shape_dist_traveled present; unit inferred
                   via kernels.infer_dist_units_to_km and converted to km
      'fallback' — shape_dist_traveled present but failed the reference's
                   +-10% unit sanity invariant -> geometric snap (the
                   reference THROWS here; we degrade and surface the count
                   as a stage metric)
      'geom'     — no usable shape_dist_traveled; DP stop-fit snapping
    """
    row = pdf.iloc[0]
    xs = np.asarray(row["xs"], dtype=np.float64)
    ys = np.asarray(row["ys"], dtype=np.float64)
    stop_ids = list(row["stop_ids"])
    sx = np.asarray(row["stop_lons"], dtype=np.float64)
    sy = np.asarray(row["stop_lats"], dtype=np.float64)
    out = {
        "shape_id": [],
        "shape_index": [],
        "from_stop_id": [],
        "to_stop_id": [],
        "start_dist_km": [],
        "length_km": [],
        "xs": [],
        "ys": [],
        "dist_source": [],
    }
    if xs.size < 2 or len(stop_ids) < 2:
        return arrow_frame(out)
    total = K.polyline_length_km(xs, ys)

    dist_along = None
    source = "geom"
    raw_dists = row.get("stop_dists")
    if raw_dists is not None:
        d = np.asarray(
            [np.nan if v is None else float(v) for v in raw_dists], dtype=np.float64
        )
        if (
            d.size == len(stop_ids)
            and np.all(np.isfinite(d))
            and np.all(np.diff(d) >= 0)
            and d[-1] > 0
        ):
            try:
                scale, _unit = K.infer_dist_units_to_km(float(d[-1]), total)
                if scale is not None:
                    dist_along = np.clip(d * scale, 0.0, total)
                    source = "dist"
            except ValueError:
                source = "fallback"  # +-10% sanity miss -> geometric snap
    if dist_along is None:
        fit = K.fit_stops_to_path(sx, sy, xs, ys)
        dist_along = fit["dist_along_km"]
    # slice boundaries: shape start, interior stop positions, shape end —
    # first/last stop-to-stop slices are extended to the shape's endpoints
    # (reference slices cover the whole shape, loaders/index.js:104-130)
    bounds = np.concatenate([[0.0], dist_along[1:-1], [total]])
    bounds = np.maximum.accumulate(bounds)  # monotone guard
    for i in range(len(stop_ids) - 1):
        lo, hi = float(bounds[i]), float(bounds[i + 1])
        if hi - lo <= 0:
            continue  # degenerate slice (two stops snapped to one point)
        gx, gy = K.line_slice_along(xs, ys, lo, hi)
        if gx.size < 2:
            continue
        out["shape_id"].append(row["shape_id"])
        out["shape_index"].append(i)
        out["from_stop_id"].append(stop_ids[i])
        out["to_stop_id"].append(stop_ids[i + 1])
        out["start_dist_km"].append(lo)
        out["length_km"].append(hi - lo)
        out["xs"].append(K.round6(gx))
        out["ys"].append(K.round6(gy))
        out["dist_source"].append(source)
    return arrow_frame(out)


def snap_and_slice(shapes_with_stops: DataFrame) -> DataFrame:
    """shapes_with_stops: one row per shape with columns
    (shape_id, xs, ys, stop_ids, stop_lons, stop_lats) — stop arrays ordered
    by the shape's authoritative stop sequence.
    Returns net.shape_segments."""
    spark = shapes_with_stops.sparkSession
    # pin kernel parallelism: one shape = one group; without the explicit
    # repartition AQE coalesces the small shuffle to few partitions and the
    # per-shape DP kernels serialize
    return (
        shapes_with_stops.repartition(
            spark.sparkContext.defaultParallelism, "shape_id"
        )
        .groupBy("shape_id")
        .applyInPandas(_fit_and_slice, SEGMENTS_SCHEMA)
        .withColumn("shape_index", F.col("shape_index").cast("int"))
    )


PRESPLIT_SCHEMA = (
    "shape_id string, part_index int, xs array<double>, ys array<double>, "
    "length_km double"
)


def presplit_long_shapes(
    shapes: DataFrame, max_len_km: float = 2.0, max_turn_deg: float = 67.5
) -> DataFrame:
    """Feature pre-split — reference shstMatchFeatures.js:46,130-175 (split
    features >2 km into equal connected chunks) combined with the
    bearing-based splitter (splitLineStringUsingSmoothness.js:8,50-81:
    split where the bearing changes more than 67.5 deg).

    Input: geo_shapes (shape_id, xs, ys). Output: one row per part, parts
    connected (each part starts at the previous part's last coordinate).
    Arrow-batched; per-shape numpy.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("shape_id", "part_index", "xs", "ys", "length_km")}
        for r in pdf.itertuples(index=False):
            xs = np.asarray(r.xs, dtype=np.float64)
            ys = np.asarray(r.ys, dtype=np.float64)
            if xs.size < 2:
                continue
            # cut at sharp bearing changes first
            cut_idx = list(K.bearing_split_indices(xs, ys, max_turn_deg=max_turn_deg))
            bounds = [0, *cut_idx, xs.size - 1]
            part = 0
            for a, b in zip(bounds[:-1], bounds[1:]):
                px, py = xs[a : b + 1], ys[a : b + 1]
                if px.size < 2:
                    continue
                total = K.polyline_length_km(px, py)
                n_chunks = max(1, int(np.ceil(total / max_len_km)))
                step = total / n_chunks
                for c in range(n_chunks):
                    cx, cy = K.line_slice_along(px, py, c * step, (c + 1) * step)
                    if cx.size < 2:
                        continue
                    out["shape_id"].append(r.shape_id)
                    out["part_index"].append(part)
                    out["xs"].append(cx)
                    out["ys"].append(cy)
                    out["length_km"].append(K.polyline_length_km(cx, cy))
                    part += 1
        return arrow_frame(out)

    spark = shapes.sparkSession
    return (
        shapes.repartition(spark.sparkContext.defaultParallelism, "shape_id")
        .groupBy("shape_id")
        .applyInPandas(lambda pdf: kernel(pdf), PRESPLIT_SCHEMA)
    )


def shapes_with_stop_sequences(
    geo_shapes: DataFrame,
    geo_stops: DataFrame,
    trips: DataFrame,
    stop_times: DataFrame,
) -> DataFrame:
    """Assemble per-shape stop arrays from the relational side.

    Reference semantics (GeoJsonGtfsDAO/generators.js:102-227): the stop
    sequence of a shape is derived from trips ⋈ stop_times; each shape must
    have a single authoritative ordered stop sequence (distinct sequences per
    shape collapse; the reference throws if they disagree — we keep the
    lexicographically first, a deterministic tie-break).

    trips/stop_times are fact tables; geo_stops is dimension-sized per feed
    and is broadcast.

    When stop_times carries shape_dist_traveled, the authoritative
    sequence's per-stop values ride along as `stop_dists` (the reference
    PREFERS them over geometric snapping, generators.js:19-94); absent or
    null values degrade to geometric snapping in the slice kernel.
    """
    sdt = (
        F.col("shape_dist_traveled").cast("double")
        if "shape_dist_traveled" in stop_times.columns
        else F.lit(None).cast("double")
    )
    seq_per_trip = _seq_per_trip(trips, stop_times, sdt)
    # one authoritative sequence per shape (deterministic min; the reference
    # THROWS on conflicting sequences — see stop_sequence_conflicts)
    seq_per_shape = seq_per_trip.groupBy("shape_id").agg(
        F.min(F.struct("stop_ids", "stop_dists")).alias("m")
    ).select(
        "shape_id",
        F.col("m.stop_ids").alias("stop_ids"),
        F.col("m.stop_dists").alias("stop_dists"),
    )
    stops_dim = F.broadcast(
        geo_stops.select("stop_id", "stop_lon", "stop_lat")
    )
    with_coords = (
        seq_per_shape.select(
            "shape_id",
            "stop_dists",
            F.posexplode("stop_ids").alias("pos", "stop_id"),
        )
        .withColumn("stop_dist", F.element_at("stop_dists", F.col("pos") + 1))
        .join(stops_dim, "stop_id")
        .groupBy("shape_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", "stop_id", "stop_lon", "stop_lat", "stop_dist")
                )
            ).alias("s")
        )
        .select(
            "shape_id",
            F.transform("s", lambda r: r["stop_id"]).alias("stop_ids"),
            F.transform("s", lambda r: r["stop_lon"]).alias("stop_lons"),
            F.transform("s", lambda r: r["stop_lat"]).alias("stop_lats"),
            F.transform("s", lambda r: r["stop_dist"]).alias("stop_dists"),
        )
    )
    return geo_shapes.select("shape_id", "xs", "ys").join(with_coords, "shape_id")


def _seq_per_trip(trips: DataFrame, stop_times: DataFrame, sdt) -> DataFrame:
    return (
        stop_times.join(trips.select("trip_id", "shape_id"), "trip_id")
        .groupBy("shape_id", "trip_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("stop_sequence", "stop_id", sdt.alias("sdt")))
            ).alias("seq")
        )
        .select(
            "shape_id",
            F.transform("seq", lambda s: s["stop_id"]).alias("stop_ids"),
            F.transform("seq", lambda s: s["sdt"]).alias("stop_dists"),
        )
    )


def stop_sequence_conflicts(trips: DataFrame, stop_times: DataFrame) -> DataFrame:
    """Shapes whose trips disagree on the stop sequence — the invariant the
    reference enforces with a THROW (GeoJsonGtfsDAO/generators.js:207-227).
    The engine collapses to the deterministic min sequence instead; this
    surface (and the pipeline's stage metric built on it) makes the
    collapse observable. Returns (shape_id, n_sequences) for conflicted
    shapes."""
    sdt = F.lit(None).cast("double")
    return (
        _seq_per_trip(trips, stop_times, sdt)
        .groupBy("shape_id")
        .agg(F.count_distinct("stop_ids").alias("n_sequences"))
        .filter(F.col("n_sequences") > 1)
    )
