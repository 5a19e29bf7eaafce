"""Stage-9 sinks — the reference's output surfaces re-expressed.

Reference: src/daos/OutputDAO/generators.js:384-405 writes 6 GDAL shapefile
layers (stops, shapes, shape segments, shst matches, chosen matches,
conflation join); tasks/conflation_map_into_mapbox dumps ND-GeoJSON for
tippecanoe. GDAL isn't in this environment; the sink contract is the data
surface, re-expressed as:

  ndgeojson_lines  one GeoJSON Feature per row, built entirely JVM-side
                   (to_json over a struct — no Python), written as text
  export_layers    the 6 layers as parquet + ndjson side by side

Geometry columns follow the engine convention: xs/ys arrays (LineString) or
lon/lat (Point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_feature_json(props: list[str]):
    """Column expression: GeoJSON LineString Feature as a JSON string."""
    coords = F.zip_with("xs", "ys", lambda x, y: F.array(x, y))
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("LineString").alias("type"), coords.alias("coordinates")
            ).alias("geometry"),
            F.struct(*[F.col(p).alias(p) for p in props]).alias("properties"),
        )
    )


def point_feature_json(lon_col: str, lat_col: str, props: list[str]):
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(lon_col), F.col(lat_col)).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[F.col(p).alias(p) for p in props]).alias("properties"),
        )
    )


def write_ndgeojson(
    df: DataFrame, path: str, kind: str = "line", props: list[str] | None = None
) -> None:
    """Write newline-delimited GeoJSON (tippecanoe's input format)."""
    if props is None:
        geom_cols = {"xs", "ys", "lon", "lat"}
        props = [c for c in df.columns if c not in geom_cols]
    expr = (
        line_feature_json(props)
        if kind == "line"
        else point_feature_json("lon", "lat", props)
    )
    df.select(expr.alias("value")).write.mode("overwrite").text(path)


def export_layers(out: dict[str, DataFrame], base_dir: str) -> dict[str, str]:
    """The reference's 6 output layers (OutputDAO/generators.js:384-405),
    each as parquet + line-delimited GeoJSON where geometry exists."""
    layer_specs = {
        "stops": ("geo_stops", "point"),
        "shapes": ("geo_shapes", "line"),
        "shape_segments": ("net_segments", "line"),
        "conflation_matches": ("matches", None),
        "match_scores": ("match_scores", None),
        "conflation_join": ("tiles", None),
    }
    written = {}
    for layer, (key, kind) in layer_specs.items():
        if key not in out:
            continue
        df = out[key]
        path = f"{base_dir}/{layer}"
        df.write.mode("overwrite").parquet(path + ".parquet")
        if kind == "line" and "xs" in df.columns:
            write_ndgeojson(df, path + ".ndjson", kind="line")
        elif kind == "point" and "stop_lon" in df.columns:
            write_ndgeojson(
                df.withColumnRenamed("stop_lon", "lon").withColumnRenamed(
                    "stop_lat", "lat"
                ),
                path + ".ndjson",
                kind="point",
            )
        written[layer] = path
    return written
