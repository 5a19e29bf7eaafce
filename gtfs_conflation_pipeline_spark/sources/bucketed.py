"""Bucketed (co-located) table storage — shuffle-free repeated joins.

At 100 TB the conflation pipeline joins the same keys over and over
(shape_id between net segments / matches / traffic; segment_id between
matches / tiles / probes). Writing both sides bucketed on the join key with
the same bucket count lets EVERY subsequent equi-join run without an
Exchange: Spark's scan reports the bucketed HashPartitioning, so
SortMergeJoin consumes the tables in place. Bucketing on shape_id ALONE
also satisfies joins and aggregations on (shape_id, shape_index):
HashPartitioning on a subset of the clustering keys satisfies
ClusteredDistribution, so the choose-stage groupBy and the pair-key joins
are exchange-free too. This is the storage-level analog of the reference's
per-stage SQLite indexes (DbService/index.js) — pay the partitioning once
at write time, reuse it every query.

Local-mode note: bucketing requires saveAsTable (a catalog), so these
helpers manage named tables in the session catalog. With `path` the table
is EXTERNAL — data lives at the given location (e.g. a checkpoint stage's
``data/`` dir, still plain parquet for external readers) and the catalog
row is just bucketing metadata; `register_bucketed` re-creates that row
over existing files after a session restart (the default in-memory catalog
does not survive one). On a real cluster the same calls target the
production catalog unchanged.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _assert_unqualified(table: str) -> None:
    if "." in table:
        raise ValueError(
            f"bucketed helpers manage unqualified table names only (got {table!r}): "
            "qualified names live under <warehouse>/<db>.db/<tbl> and the "
            "orphan cleanup would target the wrong path"
        )


def _local_path(uri: str) -> str:
    return urlparse(uri).path or uri


def _managed_location(spark: SparkSession, table: str) -> str:
    """Resolve where a MANAGED table with this name would live, via the
    catalog's current-database location (handles relative warehouse confs
    and never guesses from the driver cwd — round-3 ADVICE fix)."""
    db = spark.catalog.getDatabase(spark.catalog.currentDatabase())
    return f"{_local_path(db.locationUri)}/{table.lower()}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist `df` bucketed (and optionally sorted) on the join key.

    `path=None` writes a managed table in the warehouse; with `path` the
    table is external and the files land there (plain parquet — readable
    by non-Spark engines; the bucket layout is catalog metadata).

    Self-cleaning: drops a pre-existing catalog entry AND an orphaned
    table location (a killed previous session leaves the directory behind
    without a catalog row, which would fail the write with
    LOCATION_ALREADY_EXISTS). The location is resolved via the catalog,
    never by joining the warehouse conf against the cwd."""
    _assert_unqualified(table)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    shutil.rmtree(
        path if path is not None else _managed_location(spark, table),
        ignore_errors=True,
    )
    # pre-shuffle into the bucket layout: repartition(n, cols) uses the same
    # Pmod(Murmur3Hash(cols), n) as the bucket-id assignment, so each write
    # task holds exactly one bucket -> one file per bucket, not tasks*buckets
    w = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def schema_ddl(schema: T.StructType) -> str:
    """Column-definition DDL for CREATE TABLE (re-registration after a
    session restart)."""
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def register_bucketed(
    spark: SparkSession,
    table: str,
    ddl: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """(Re-)create the catalog row for an EXTERNAL bucketed table over
    files previously written by `write_bucketed(..., path=...)` — needed
    after a session restart because the default in-memory catalog dies with
    the session while the bucketed files (and their layout) persist."""
    _assert_unqualified(table)
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    sorted_by = (
        f" SORTED BY ({', '.join(f'`{c}`' for c in sort_cols)})" if sort_cols else ""
    )
    spark.sql(
        f"CREATE TABLE `{table}` ({ddl}) USING PARQUET "
        f"CLUSTERED BY ({', '.join(f'`{c}`' for c in bucket_cols)}){sorted_by} "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def table_location(spark: SparkSession, table: str) -> str | None:
    """The catalog-recorded location of `table`, or None if absent."""
    if not spark.catalog.tableExists(table):
        return None
    row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED `{table}`")
        .filter("col_name = 'Location'")
        .collect()
    )
    return _local_path(row[0]["data_type"]) if row else None


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True iff the executed plan contains NO shuffle Exchange — the
    co-location proof for a join of two same-bucketed tables (used by
    tests and plan audits)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and "Exchange rangepartitioning" not in plan
