"""Stage-1 source — GTFS feed (zip of CSVs) -> typed raw tables.

Reference: src/pipeline_transforms/raw_gtfs_into_sqlite/index.js:18-37 streams
CSV members out of the zip; src/daos/RawGtfsDAO/createTableFns.js:14-186
declares per-table DDL; src/utils/formatRowForSqliteInsert.js:12-15 maps
'' -> NULL. SUPPORTED_TABLES (src/daos/RawGtfsDAO/SUPPORTED_TABLES.js:1-15)
whitelists the 13 member files.

Spark shape: a GTFS feed is dimension-sized (MBs), so the zip is expanded
driver-side to a temp dir and each member read with spark.read.csv under an
explicit schema (schema-on-read with the reference's lax-TEXT semantics:
every column lands as string, typed casts happen at the geo/net stages,
matching SQLite column-affinity coercion).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_TABLES = [
    "agency",
    "stops",
    "routes",
    "trips",
    "stop_times",
    "calendar",
    "calendar_dates",
    "fare_attributes",
    "fare_rules",
    "shapes",
    "frequencies",
    "transfers",
    "feed_info",
]


def read_gtfs_zip(
    spark: SparkSession, zip_path: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read a GTFS zip into {table_name: DataFrame} (header-inferred columns,
    all string-typed, '' normalized to NULL)."""
    want = tables or SUPPORTED_TABLES
    out: dict[str, DataFrame] = {}
    tmp = tempfile.mkdtemp(prefix="gtfs_zip_")
    with zipfile.ZipFile(zip_path) as z:
        for member in z.namelist():
            name = os.path.basename(member).replace(".txt", "").replace(".csv", "")
            if name not in want or member.endswith("/"):
                continue
            z.extract(member, tmp)
            df = spark.read.csv(
                os.path.join(tmp, member), header=True, inferSchema=False
            )
            # '' -> NULL (formatRowForSqliteInsert.js:12-15)
            df = df.select(
                *[
                    F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c)
                    for c in df.columns
                ]
            )
            out[name] = df
    return out


def typed_raw_tables(raw: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Apply the reference's numeric affinities where downstream stages need
    them (createTableFns.js REAL/INTEGER columns)."""
    out = dict(raw)
    if "shapes" in out:
        s = out["shapes"]
        out["shapes"] = s.select(
            "shape_id",
            F.col("shape_pt_lat").cast("double").alias("shape_pt_lat"),
            F.col("shape_pt_lon").cast("double").alias("shape_pt_lon"),
            F.col("shape_pt_sequence").cast("int").alias("shape_pt_sequence"),
            *(
                [F.col("shape_dist_traveled").cast("double").alias("shape_dist_traveled")]
                if "shape_dist_traveled" in s.columns
                else []
            ),
        )
    if "stops" in out:
        s = out["stops"]
        out["stops"] = s.select(
            *[
                F.col(c).cast("double").alias(c)
                if c in ("stop_lat", "stop_lon")
                else F.col(c)
                for c in s.columns
            ]
        )
    if "stop_times" in out:
        s = out["stop_times"]
        out["stop_times"] = s.select(
            *[
                F.col(c).cast("int").alias(c)
                if c == "stop_sequence"
                else F.col(c).cast("double").alias(c)
                if c == "shape_dist_traveled"
                else F.col(c)
                for c in s.columns
            ]
        )
    return out
