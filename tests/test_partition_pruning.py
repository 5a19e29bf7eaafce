"""Hive/Iceberg-style partition pruning on the spatial store: a polygon
query against a p_cell-partitioned table reads only the touched partition
directories (PartitionFilters in the scan), with results identical to the
unpartitioned path."""

import numpy as np
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager
from gtfs_conflation_pipeline_spark.operators.pip_query import (
    partition_cell_of,
    segments_overlapping_polygon,
)


def _partitioned_osm(spark, tmp_path, n=2000):
    osm = FX.osm_segments_table(spark, n, partitions=8).withColumn(
        "p_cell",
        partition_cell_of(F.element_at("xs", 1), F.element_at("ys", 1)),
    )
    ck = CheckpointManager(str(tmp_path / "store"))
    ck.write(osm, "osm_partitioned", partition_by=["p_cell"])
    return ck.read(spark, "osm_partitioned")


def _ring_around(pdf_row, pad=0.003):
    xs0 = np.asarray(pdf_row["xs"])
    ys0 = np.asarray(pdf_row["ys"])
    rx = np.array(
        [xs0.min() - pad, xs0.max() + pad, xs0.max() + pad, xs0.min() - pad, xs0.min() - pad]
    )
    ry = np.array(
        [ys0.min() - pad, ys0.min() - pad, ys0.max() + pad, ys0.max() + pad, ys0.min() - pad]
    )
    return rx, ry


def test_partitioned_store_layout(spark, tmp_path):
    import os

    osm_p = _partitioned_osm(spark, tmp_path)
    d = str(tmp_path / "store" / "osm_partitioned" / "data")
    parts = [p for p in os.listdir(d) if p.startswith("p_cell=")]
    assert len(parts) > 3  # multiple hive partition dirs exist


def test_pruned_query_equals_unpartitioned(spark, tmp_path):
    osm_plain = FX.osm_segments_table(spark, 2000, partitions=8)
    osm_p = _partitioned_osm(spark, tmp_path)
    rx, ry = _ring_around(osm_plain.limit(1).toPandas().iloc[0])
    a = set(
        segments_overlapping_polygon(osm_plain, rx, ry).toPandas().segment_id
    )
    b = set(segments_overlapping_polygon(osm_p, rx, ry).toPandas().segment_id)
    assert a == b and len(a) > 0


def test_scan_shows_partition_filters(spark, tmp_path):
    osm_p = _partitioned_osm(spark, tmp_path)
    rx, ry = _ring_around(osm_p.limit(1).toPandas().iloc[0])
    q = segments_overlapping_polygon(osm_p, rx, ry)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the p_cell isin filter must appear in PartitionFilters (pruning),
    # not only as a post-scan Filter
    seg = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "p_cell" in seg
