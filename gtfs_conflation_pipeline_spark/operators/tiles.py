"""Raster-tile <-> vector-segment assignment (stage 9 tiling analog).

The reference dumps the conflation map to ND-GeoJSON and lets tippecanoe cut
mbtiles, filtering features into zoom ranges by OSM network level
(tasks/conflation_map_into_mapbox/bin/createMBTilesNDGeoJSON FILTER block).
The tile ASSIGNMENT — which (zoom, x, y) tiles each matched segment lands
in — is the part with query semantics, reproduced here as a DataFrame op:

  matched segments ⋈ osm geometry -> zoom = f(networklevel)
                                  -> explode(web-mercator tiles of polyline)

Output: one row per (segment_id, tile_id, zoom) — the second half of the
BASELINE flagship metric (join rows + tile assignments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import make_tiles_udf


def assign_tiles(matches: DataFrame, osm: DataFrame) -> DataFrame:
    """matches: chosen conflation matches (must carry segment_id,
    networklevel). osm: osm.segments with (segment_id, xs, ys).
    Returns (segment_id, min_zoom, tile_id) distinct — tiles are cut at the
    feature's MIN zoom; the reference FILTER admits it at every zoom >=
    min_zoom (range semantics, derivable from this compact form)."""
    tiles_of = make_tiles_udf()
    matched_segments = matches.select("segment_id", "networklevel").distinct()
    # min-zoom rules by network level: the reference tippecanoe FILTER
    # thresholds, literally (createMBTilesNDGeoJSON:13-39; same constants
    # as kernels.zoom_for_networklevel — JVM-side so only the tile cover
    # needs Python)
    nl = F.col("networklevel")
    min_zoom = (
        F.when(nl < 1, 0)
        .when(nl == 1, 3)
        .when(nl == 2, 4)
        .when(nl == 3, 10)
        .when(nl == 4, 13)
        .otherwise(14)
        .cast("int")
    )
    # No repartition before the tile UDF (round 7): the geometry side is a
    # stage checkpoint written with >= max-parallelism files/buckets, so the
    # broadcast join's output already carries the scan's full task count —
    # the old round-robin exchange re-shuffled every coordinate array
    # (~150 MB at 4M images) to arrange parallelism the scan already had.
    geom = osm.select("segment_id", "xs", "ys")
    return (
        matched_segments.join(geom, "segment_id")
        .withColumn("min_zoom", min_zoom)
        .select(
            "segment_id",
            "min_zoom",
            F.explode(tiles_of("xs", "ys", "min_zoom")).alias("tile_id"),
        )
        .distinct()
    )
