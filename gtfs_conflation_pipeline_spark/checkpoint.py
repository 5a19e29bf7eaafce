"""Stage checkpointing with per-partition lineage manifests.

The reference pipeline is 9 sequential CLI stages, each committing into its
own SQLite file (DbService/index.js:27-54) — re-running a stage is safe
because it drops/recreates its tables in one transaction. Our analog
(north-rule requirement): every stage writes Parquet (Iceberg-shaped layout:
``data/`` + ``_manifest/``), plus a per-partition lineage manifest recording
rows out, key extents and metric counters. A stage whose manifest is complete
is skipped on re-run (idempotent resume); a partial write (no manifest) is
overwritten atomically by the next run.

No Iceberg jars ship in this sandbox; the layout and commit protocol are
Iceberg-compatible (atomic replace of data + manifest marker) so the write
format can be swapped via config on a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import bucketed as B

MANIFEST = "_manifest.json"


class CheckpointManager:
    def __init__(self, root: str, verbose: bool = False):
        self.root = root
        self.verbose = verbose
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _data(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "data")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), MANIFEST)

    def _table_name(self, stage: str) -> str:
        """Catalog table name for a bucketed stage: unique per checkpoint
        root so two pipelines (e.g. the entry fixture and a query cache)
        never collide on the same stage name."""
        import hashlib

        h = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:8]
        return f"ckpt_{h}_{stage}".replace("-", "_").replace(".", "_")

    # -- protocol ------------------------------------------------------------
    def is_complete(self, stage: str) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return json.load(f).get("complete", False)
        except (OSError, json.JSONDecodeError):
            return False

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        """Read a completed stage. Bucketed stages come back through the
        catalog so every read carries the bucketed HashPartitioning
        (shuffle-free downstream joins); the catalog row is re-created from
        the manifest's recorded spec when a fresh session lacks it (the
        in-memory catalog dies with the session; the files don't)."""
        spec = None
        if os.path.exists(self._manifest_path(stage)):
            spec = self.manifest(stage).get("bucketed")
        if not spec:
            return spark.read.parquet(self._data(stage))
        tbl = spec["table"]
        d = self._data(stage)
        if B.table_location(spark, tbl) != d:
            B.register_bucketed(
                spark,
                tbl,
                spec["schema_ddl"],
                spec["bucket_cols"],
                spec["n_buckets"],
                d,
                sort_cols=spec.get("sort_cols"),
            )
        return spark.table(tbl)

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def write(
        self,
        df: DataFrame,
        stage: str,
        metrics: dict | None = None,
        cell_col: str | None = None,
        num_files: int | None = None,
        rows_in_from: str | None = None,
        partition_by: list[str] | None = None,
        bucket_by: list[str] | None = None,
        n_buckets: int = 32,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """Write a stage output + per-partition lineage manifest.

        Lineage per written partition: rows_out, and (if ``cell_col`` is a
        column of cell/tile ids) the count of distinct cells touched — the
        north rule's per-partition metrics (rows in/out, cells touched).

        ``partition_by``: hive-style partition columns (the parquet analog
        of an Iceberg partition spec) — downstream queries that filter on
        them get partition pruning at the scan.

        ``bucket_by``: write the stage CO-LOCATED on the given join key
        (sources.bucketed): the files still land under ``data/`` as plain
        parquet (external readers — and the DuckDB stage oracles — are
        unaffected), but reads go through the catalog and report the
        bucketed HashPartitioning, so every downstream equi-join or
        aggregation on (a superset of) the bucket key skips its Exchange.
        The bucket spec is recorded in the manifest and re-registered on
        resume in a fresh session.
        """
        spark = df.sparkSession
        d = self._data(stage)
        tmp_manifest = self._manifest_path(stage) + ".tmp"
        if os.path.exists(self._manifest_path(stage)):
            os.remove(self._manifest_path(stage))

        t0 = time.time()
        bucket_spec = None
        if bucket_by:
            if partition_by:
                raise ValueError("bucket_by and partition_by are mutually exclusive")
            tbl = self._table_name(stage)
            B.write_bucketed(
                df, tbl, bucket_by, n_buckets=n_buckets, sort_cols=sort_by, path=d
            )
            out = spark.table(tbl)
            bucket_spec = {
                "table": tbl,
                "bucket_cols": list(bucket_by),
                "n_buckets": n_buckets,
                "sort_cols": list(sort_by) if sort_by else None,
                "schema_ddl": B.schema_ddl(out.schema),
            }
        else:
            if num_files:
                # a stage output that downstream kernel stages scan should
                # have >= cluster-parallelism files, or the scan caps their
                # task count
                df = df.repartition(num_files)
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(d)
            out = spark.read.parquet(d)

        # per-file (== per written partition) lineage rows
        agg = [F.count(F.lit(1)).alias("rows_out")]
        if cell_col and cell_col in out.columns:
            agg.append(F.approx_count_distinct(cell_col).alias("cells_touched"))
        part_rows = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(*agg)
            .collect()
        )
        rows_in = None
        if rows_in_from and self.is_complete(rows_in_from):
            rows_in = self.manifest(rows_in_from).get("rows_out")
        manifest = {
            "stage": stage,
            "complete": True,
            "rows_in": rows_in,
            "rows_in_from": rows_in_from,
            "written_at": time.time(),
            "wall_sec": round(time.time() - t0, 3),
            "rows_out": sum(r["rows_out"] for r in part_rows),
            "n_partitions": len(part_rows),
            "bucketed": bucket_spec,
            "partitions": [
                {
                    "file": os.path.basename(r["file"]),
                    "rows_out": r["rows_out"],
                    **(
                        {"cells_touched": r["cells_touched"]}
                        if "cells_touched" in r.asDict()
                        else {}
                    ),
                }
                for r in part_rows
            ],
            "metrics": metrics or {},
        }
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_manifest, self._manifest_path(stage))  # atomic commit
        return out

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        fn: Callable[[], DataFrame],
        metrics_fn: Callable[[DataFrame], dict] | None = None,
        cell_col: str | None = None,
        num_files: int | None = None,
        rows_in_from: str | None = None,
        bucket_by: list[str] | None = None,
        n_buckets: int = 32,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """Compute-or-resume: skip ``fn`` entirely if the stage's manifest is
        complete (the reference's per-stage re-runnability, run:41-49)."""
        if self.is_complete(stage):
            if self.verbose:
                print(f"[ckpt] resume {stage}: skipping compute")
            return self.read(spark, stage)
        df = fn()
        metrics = metrics_fn(df) if metrics_fn else None
        return self.write(
            df,
            stage,
            metrics=metrics,
            cell_col=cell_col,
            num_files=num_files,
            rows_in_from=rows_in_from,
            bucket_by=bucket_by,
            n_buckets=n_buckets,
            sort_by=sort_by,
        )

    def invalidate(self, stage: str) -> None:
        shutil.rmtree(self._dir(stage), ignore_errors=True)
