"""Pass C — chosen-match scoring (reference stage 4, loadChosenShstMatchesScores).

The reference re-joins chosen matches to their geometries and scores each
(GTFS segment, chosen path) pair with a resampled curve-similarity metric
(scoreChosenPaths/frechet.js:6-35: resample both curves to
min(max(|S|,|T|), ceil(maxLen_km * 50)) points, then one scalar similarity).
We emit the discrete Fréchet distance plus symmetric Hausdorff — same role,
numerically defined metrics.

Arrow-batched mapInPandas; geometry slices are cut with the same
line_slice_along kernel the net stage used, so score inputs are exactly the
matched sub-geometries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K

POINTS_PER_KM = 50  # frechet.js:6 pointsPerKm

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("shape_id", T.StringType()),
        T.StructField("shape_index", T.IntegerType()),
        T.StructField("segment_id", T.LongType()),
        T.StructField("shst_reference", T.StringType()),
        T.StructField("frechet_km", T.DoubleType()),
        T.StructField("hausdorff_km", T.DoubleType()),
        T.StructField("mean_dev_km", T.DoubleType()),
    ]
)


def score_pair(gx, gy, ox, oy, a0, a1, b0, b1):
    """Score one chosen match: slice both geometries to the matched
    intervals, resample (frechet.js semantics), Fréchet + Hausdorff +
    mean bidirectional snap deviation."""
    sx, sy = K.line_slice_along(gx, gy, a0, a1)
    tx, ty = K.line_slice_along(ox, oy, b0, b1)
    if sx.size < 2 or tx.size < 2:
        return None
    max_len = max(a1 - a0, b1 - b0)
    n = int(min(max(sx.size, tx.size), max(2, np.ceil(max_len * POINTS_PER_KM))))
    rsx, rsy = K.resample_polyline(sx, sy, n)
    rtx, rty = K.resample_polyline(tx, ty, n)
    fr = K.discrete_frechet_km(rsx, rsy, rtx, rty)
    hd = K.hausdorff_km(sx, sy, tx, ty)
    stats = K.similarity_stats(sx, sy, tx, ty)
    return fr, hd, stats["mean_km"]


def score_matches(matches: DataFrame, segments: DataFrame, osm: DataFrame) -> DataFrame:
    """matches: chosen conflation matches; segments: net.shape_segments
    (xs, ys); osm: osm.segments (xs, ys). Returns match.scores."""
    g = segments.select(
        "shape_id", "shape_index", F.col("xs").alias("g_xs"), F.col("ys").alias("g_ys")
    )
    o = osm.select("segment_id", F.col("xs").alias("o_xs"), F.col("ys").alias("o_ys"))
    inp = (
        matches.select(
            "shape_id",
            "shape_index",
            "segment_id",
            "shst_reference",
            "section_start",
            "section_end",
            "osm_start",
            "osm_end",
        )
        .join(g, ["shape_id", "shape_index"])
        .join(o, "segment_id")
    )
    par = matches.sparkSession.sparkContext.defaultParallelism
    inp = inp.repartition(par)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in SCORES_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                s = score_pair(
                    np.asarray(r.g_xs),
                    np.asarray(r.g_ys),
                    np.asarray(r.o_xs),
                    np.asarray(r.o_ys),
                    r.section_start,
                    r.section_end,
                    r.osm_start,
                    r.osm_end,
                )
                if s is None:
                    continue
                rows["shape_id"].append(r.shape_id)
                rows["shape_index"].append(r.shape_index)
                rows["segment_id"].append(r.segment_id)
                rows["shst_reference"].append(r.shst_reference)
                rows["frechet_km"].append(s[0])
                rows["hausdorff_km"].append(s[1])
                rows["mean_dev_km"].append(s[2])
            yield pd.DataFrame(rows)

    return inp.mapInPandas(kernel, SCORES_SCHEMA)
