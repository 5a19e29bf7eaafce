"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship conflation join + tile assignment on the
                 deterministic synthetic fixture (sf0.001-scale).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); each callable: (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching ANSI SQL for DuckDB (51 of 60 entries): the
                 pre-registered testdata views for the relational queries;
                 read_parquet over each stage's direct-input checkpoints
                 for the schedule stages (service_dates / scheduled_traffic
                 / probe_data / traffic_by_route / aadt_breakdown); and,
                 for the LSH/ANN/dedup family (simhash_pairs,
                 phash_neardup, lsh_ann, ivf_ann, minhash_lsh,
                 dedup_clusters, embedding_neardup_lsh, image_embed_topk),
                 read_parquet over a checkpointed signature/assignment/
                 pair table — the engine-specific step SQL cannot
                 reproduce — with everything downstream (candidate joins,
                 Hamming brute force, exact-Jaccard/cosine verify,
                 RECURSIVE-CTE components, top-k rerank) independently
                 re-derived in SQL. In all checkpoint-backed cases the
                 Spark query runs first and materializes the inputs.
                 The flagship conflation_matches is oracled too: its
                 CHOOSE greedy interval cover re-derives as a RECURSIVE
                 CTE with a kept-interval LIST accumulator over the
                 `refined` + `net_segments` stage checkpoints (bit-exact
                 — the floats are pass-through from the same parquet).
                 Entries absent here (tile_assignments, match_paths,
                 map_cospatiality,
                 match_scores, redundant_removal, image_decode_stats,
                 image_transcode_dct, audio_features, video_frame_stats)
                 are non-SQL-expressible (geometry kernels / greedy
                 order-dependent logic / binary payload decode) and take
                 the rows-only check; the geometry ones are instead
                 verified exactly against a pure-numpy oracle in
                 tests/test_pipeline_e2e.py, the greedy coord-subset
                 pruning against exhaustive fixtures in
                 tests/test_redundant_matches.py, and the multimodal
                 decoders against ground-truth/determinism gates in
                 tests/test_audio.py / test_video.py /
                 test_stateful_and_psnr.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _prep(spark: SparkSession) -> None:
    from gtfs_conflation_pipeline_spark.session import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: shape->OSM conflation join rows at sf0.001 scale
    (1000 images -> 20 shapes), checkpointed under /tmp."""
    _prep(spark)
    from gtfs_conflation_pipeline_spark import __version__
    from gtfs_conflation_pipeline_spark.plans.pipeline import run_pipeline

    # version-keyed checkpoint dir: stale checkpoints from an older engine
    # build must never be served to the driver's smoke check
    out = run_pipeline(
        spark, 1000, f"/tmp/spark_graft_entry_ckpt_{__version__}", partitions=8
    )
    return out["matches"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gtfs_conflation_pipeline_spark.plans.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from gtfs_conflation_pipeline_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
