"""Arrow-vectorized pandas_udf wrappers around the numpy kernels.

These are the ONLY Python entry points on the hot path — every one receives
Arrow batches and runs numpy kernels; no per-row Python UDFs exist in this
engine (north-rule requirement; enforced by tests/test_no_row_udfs.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K


def arrow_frame(out: dict, object_cols: tuple[str, ...] = ("xs", "ys")) -> pd.DataFrame:
    """Build a kernel-output DataFrame whose array columns survive Arrow
    conversion even when EMPTY: a zero-row dict-of-lists otherwise yields
    float64 columns that Arrow cannot cast to list<double>."""
    df = pd.DataFrame({k: v for k, v in out.items() if k not in object_cols})
    for c in object_cols:
        if c in out:
            df[c] = pd.Series(out[c], dtype=object)
    return df[list(out.keys())]


@F.pandas_udf(T.DoubleType())
def length_km(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Polyline haversine length (turf.length) per row."""
    return pd.Series(
        [K.polyline_length_km(np.asarray(x), np.asarray(y)) for x, y in zip(xs, ys)]
    )


@F.pandas_udf(T.LongType())
def cell_of(lon: pd.Series, lat: pd.Series, cell_deg: pd.Series) -> pd.Series:
    """Morton cell id of a point at the given resolution."""
    return pd.Series(K.cell_id(lon.values, lat.values, float(cell_deg.iloc[0])))


def make_cover_cells_udf(cell_deg: float, ring: int):
    """Cover cells of a polyline (cells of midpoint-densified vertices,
    optionally k-ring dilated) — the candidate-generation key set.

    Returned as array<long>; explode() downstream. ring widening is the
    Spark analog of the reference's retry ladder
    (shstMatchFeatures.js:283-362 — a miss widens the search radius).
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover_cells(xs: pd.Series, ys: pd.Series) -> pd.Series:
        dx, dy = [], []
        for x, y in zip(xs, ys):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            if x.size >= 2:
                x, y = K.midpoints(x, y)
            dx.append(x)
            dy.append(y)
        # one vectorized pass for the whole Arrow batch (per-row
        # unique(axis=0) was the candidate-generation bottleneck)
        return pd.Series(K.cell_cover_rows(dx, dy, cell_deg, ring=ring))

    return cover_cells


def make_tiles_udf(zoom_by_row: bool = True):
    """Tile keys covering a polyline at its per-row zoom.

    Batch-vectorized (round 7): rows are grouped by zoom (<= 6 distinct
    min-zoom values exist) and each group runs ONE lonlat_to_tile +
    lexsort-unique pass over the concatenated vertices — the per-row loop
    with a structured np.unique(axis=0) per polyline was dispatch-bound
    (same disease as the round-2 cover-cell fix). Per-row tile SETS and
    their order are identical to tiles_for_polyline: tile_key is injective
    on (fixed zoom, xt, yt) and monotone in (xt, yt), so key-sorted unique
    == pair-lexsorted unique."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def tiles_of(xs: pd.Series, ys: pd.Series, zoom: pd.Series) -> pd.Series:
        out: list = [None] * len(xs)
        by_zoom: dict[int, list[int]] = {}
        for i, z in enumerate(zoom):
            by_zoom.setdefault(int(z), []).append(i)
        xv = xs.values
        yv = ys.values
        for z, idxs in by_zoom.items():
            arrs = [np.asarray(xv[i], dtype=np.float64) for i in idxs]
            lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
            if int(lens.sum()) == 0:
                for i in idxs:
                    out[i] = np.empty(0, dtype=np.int64)
                continue
            lon = np.concatenate(arrs)
            lat = np.concatenate(
                [np.asarray(yv[i], dtype=np.float64) for i in idxs]
            )
            xt, yt = K.lonlat_to_tile(lon, lat, z)
            key = K.tile_key(z, xt, yt)
            row_id = np.repeat(np.arange(len(idxs)), lens)
            order = np.lexsort((key, row_id))
            rs, ks = row_id[order], key[order]
            new = np.empty(ks.size, dtype=bool)
            new[0] = True
            new[1:] = (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])
            ur, uk = rs[new], ks[new]
            bounds = np.searchsorted(ur, np.arange(len(idxs) + 1))
            for j, i in enumerate(idxs):
                out[i] = uk[bounds[j] : bounds[j + 1]]
        return pd.Series(out)

    return tiles_of


@F.pandas_udf(T.StringType())
def geoprox_key_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Reference-parity base-36 geoprox key (getGeoProximityKey.js)."""
    return pd.Series(
        [K.geoprox_key(np.asarray(x), np.asarray(y)) for x, y in zip(xs, ys)]
    )
