"""Pass C — chosen-match scoring (reference stage 4, loadChosenShstMatchesScores).

The reference re-joins chosen matches to their geometries and scores each
(GTFS segment, chosen path) pair with a resampled curve-similarity metric
(scoreChosenPaths/frechet.js:6-35: resample both curves to
min(max(|S|,|T|), ceil(maxLen_km * 50)) points, then curve-matcher
shapeSimilarity with restrictRotationAngle = 0.1*pi). We emit that
reference-parity `shape_similarity` (kernels.shape_similarity — Procrustes
normalize + rotation-restricted minimum planar Fréchet) PLUS the
numerically defined discrete Fréchet distance and symmetric Hausdorff.

Arrow-batched mapInPandas with CROSS-PAIR PACKING (round-3): within each
Arrow batch, pairs are grouped by (slice-vertex-counts, resample-n) and
each group runs through ONE vectorized kernel call per metric
(discrete_frechet_km_batch / hausdorff_km_batch / mean_dev_km_batch /
shape_similarity_batch) over (P, n) stacks — per-pair numpy on ~20-50
point arrays is dispatch-overhead-bound, and the Fréchet DP in particular
drops from P*n*m python iterations to n*m. Outputs are value-identical to
the scalar score_pair (same op order; asserted in tests), which remains
the oracle-side reference implementation. Geometry slices are cut with the
same line_slice_along kernel the net stage used, so score inputs are
exactly the matched sub-geometries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K
from .spatial_join import _slab_rows

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
        T.StructField("shape_similarity", T.DoubleType()),
    ]
)


def _slice_and_n(gx, gy, ox, oy, a0, a1, b0, b1):
    """Shared slice + resample-count step (frechet.js:25-30 numPoints)."""
    sx, sy = K.line_slice_along(gx, gy, a0, a1)
    tx, ty = K.line_slice_along(ox, oy, b0, b1)
    if sx.size < 2 or tx.size < 2:
        return None
    max_len = max(a1 - a0, b1 - b0)
    n = int(min(max(sx.size, tx.size), max(2, np.ceil(max_len * POINTS_PER_KM))))
    return sx, sy, tx, ty, n


def score_pair(gx, gy, ox, oy, a0, a1, b0, b1):
    """Score one chosen match: slice both geometries to the matched
    intervals, resample (frechet.js semantics), Fréchet + Hausdorff +
    mean bidirectional snap deviation + reference-parity shapeSimilarity.
    Scalar reference implementation (the numpy-oracle path); the Spark
    kernel packs the same ops across pairs."""
    sl = _slice_and_n(gx, gy, ox, oy, a0, a1, b0, b1)
    if sl is None:
        return None
    sx, sy, tx, ty, n = sl
    rsx, rsy = K.resample_polyline(sx, sy, n)
    rtx, rty = K.resample_polyline(tx, ty, n)
    fr = K.discrete_frechet_km(rsx, rsy, rtx, rty)
    hd = K.hausdorff_km(sx, sy, tx, ty)
    stats = K.similarity_stats(sx, sy, tx, ty)
    ss = K.shape_similarity(rsx, rsy, rtx, rty)
    return fr, hd, stats["mean_km"], ss


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

    meta_cols = ("shape_id", "shape_index", "segment_id", "shst_reference")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in SCORES_SCHEMA.fields}
            gx = pdf["g_xs"].to_numpy()
            gy = pdf["g_ys"].to_numpy()
            ox = pdf["o_xs"].to_numpy()
            oy = pdf["o_ys"].to_numpy()
            a0 = pdf["section_start"].to_numpy()
            a1 = pdf["section_end"].to_numpy()
            b0 = pdf["osm_start"].to_numpy()
            b1 = pdf["osm_end"].to_numpy()
            meta = {c: pdf[c].to_numpy() for c in meta_cols}
            # slice per row (variable-size output), then PACK pairs whose
            # (slice sizes, resample n) agree into one kernel call per group
            groups: dict[tuple[int, int, int], list] = {}
            for i in range(len(pdf)):
                sl = _slice_and_n(
                    np.asarray(gx[i]), np.asarray(gy[i]),
                    np.asarray(ox[i]), np.asarray(oy[i]),
                    a0[i], a1[i], b0[i], b1[i],
                )
                if sl is None:
                    continue
                sx, sy, tx, ty, n = sl
                groups.setdefault((sx.size, tx.size, n), []).append(
                    (i, sx, sy, tx, ty)
                )
            for (ns, nt, n), items in groups.items():
                # slab cap: the Fréchet DP / snap tensors are (slab, n, n)
                # and (slab, ns, nt) float64 — bounded slabs keep them
                # cache-resident (see spatial_join.KERNEL_SLAB_ELEMS)
                slab = _slab_rows(max(n * n, ns * nt, nt * ns, 50 * 50))
                for s0 in range(0, len(items), slab):
                    sl = items[s0 : s0 + slab]
                    SX = np.stack([it[1] for it in sl])
                    SY = np.stack([it[2] for it in sl])
                    TX = np.stack([it[3] for it in sl])
                    TY = np.stack([it[4] for it in sl])
                    rs = [K.resample_polyline(it[1], it[2], n) for it in sl]
                    rt = [K.resample_polyline(it[3], it[4], n) for it in sl]
                    RSX = np.stack([r[0] for r in rs])
                    RSY = np.stack([r[1] for r in rs])
                    RTX = np.stack([r[0] for r in rt])
                    RTY = np.stack([r[1] for r in rt])
                    fr = K.discrete_frechet_km_batch(RSX, RSY, RTX, RTY)
                    hd = K.hausdorff_km_batch(SX, SY, TX, TY)
                    md = K.mean_dev_km_batch(SX, SY, TX, TY)
                    ss = K.shape_similarity_batch(RSX, RSY, RTX, RTY)
                    idxs = [it[0] for it in sl]
                    for c in meta_cols:
                        rows[c].extend(meta[c][idxs])
                    rows["frechet_km"].extend(fr)
                    rows["hausdorff_km"].extend(hd)
                    rows["mean_dev_km"].extend(md)
                    rows["shape_similarity"].extend(ss)
            yield pd.DataFrame(rows)

    return inp.mapInPandas(kernel, SCORES_SCHEMA)
