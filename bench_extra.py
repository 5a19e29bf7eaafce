#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1).

NOT the driver contract — bench.py is frozen for measurement. This file
isolates the computation of each flagship stage and each headline query with
the noop sink (df.write.format("noop")), labels jobs, and can dump
explain("formatted") for every headline query to plans/r07/.

Usage:
  python bench_extra.py plans <outdir-suffix>   # dump explain() per query
  python bench_extra.py flagship                # stage-isolated flagship timings
  python bench_extra.py queries [name ...]      # noop-timed headline queries
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "1000000"))

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "range_join",
    "window_rank",
    "window_cumsum",
    "epoch_dow_buckets",
    "knn_1nn",
    "tile_assign",
    "ngram_jaccard",
    "cosine_topk",
    "minhash_lsh",
    "simhash_pairs",
]


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def get_session():
    from gtfs_conflation_pipeline_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS)
    # same warm-up as bench.py so numbers are comparable
    spark.range(1 << 22).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    return spark


def flagship_stages(spark):
    """Time each flagship stage in isolation over the shared checkpointed
    setup (same work dir discipline as bench.py --flagship-only)."""
    from gtfs_conflation_pipeline_spark import fixtures as FX
    from gtfs_conflation_pipeline_spark.checkpoint import CheckpointManager
    from gtfs_conflation_pipeline_spark.operators import snap, spatial_join, tiles
    from gtfs_conflation_pipeline_spark.plans.pipeline import geo_shapes_from_raw

    work = os.environ.get(
        "SPARK_GRAFT_BENCH_WORKDIR", f"/tmp/spark_graft_bench_c{CPUS}_n{N_IMAGES}"
    )
    ckpt = CheckpointManager(work)
    nf = 32
    images = ckpt.run_stage(
        spark, "images", lambda: FX.images_table(spark, N_IMAGES, with_bytes=False)
    )
    osm = ckpt.run_stage(
        spark, "osm_segments", lambda: FX.osm_segments_table(spark, N_IMAGES),
        num_files=nf,
    )
    raw = FX.raw_tables(spark, images)
    geo_shapes = ckpt.run_stage(
        spark, "geo_shapes", lambda: geo_shapes_from_raw(raw["shapes"])
    )
    net = ckpt.run_stage(
        spark, "net_segments",
        lambda: snap.snap_and_slice(
            snap.shapes_with_stop_sequences(
                geo_shapes, raw["stops"], raw["trips"], raw["stop_times"]
            )
        ),
        num_files=nf,
    )
    sc = spark.sparkContext
    res = {}
    for it in range(int(os.environ.get("SPARK_GRAFT_EXTRA_ITERS", "2"))):
        sc.setJobDescription("flagship: candidates")
        pairs = spatial_join.candidate_pairs(net, osm)
        res.setdefault("candidates", []).append(round(noop(pairs), 2))

        sc.setJobDescription("flagship: candidates+refine")
        refined = spatial_join.refine(spatial_join.candidate_pairs(net, osm))
        res.setdefault("refine(cum)", []).append(round(noop(refined), 2))

        sc.setJobDescription("flagship: full match (choose)")
        m = spatial_join.conflation_join(net, osm)
        res.setdefault("match(cum)", []).append(round(noop(m), 2))

        sc.setJobDescription("flagship: tiles from persisted matches")
        mp = spatial_join.conflation_join(net, osm).persist()
        mp.count()
        t = tiles.assign_tiles(mp, osm)
        res.setdefault("tiles", []).append(round(noop(t), 2))
        mp.unpersist()
        sc.setJobDescription(None)
    print({"n_images": N_IMAGES, **res})


def time_queries(spark, names):
    from gtfs_conflation_pipeline_spark.plans.queries import QUERIES

    res = {}
    for name in names:
        times = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"q:{name}")
            times.append(round(noop(QUERIES[name](spark, SF_DIR)), 3))
        spark.sparkContext.setJobDescription(None)
        res[name] = times
        print(name, times, flush=True)
    print(res)


def dump_plans(spark, suffix, names):
    from gtfs_conflation_pipeline_spark.plans.queries import QUERIES

    outdir = os.path.join(REPO, "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = get_session()
    if mode == "plans":
        suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
        names = sys.argv[3:] or HEADLINE
        dump_plans(spark, suffix, names)
    elif mode == "flagship":
        flagship_stages(spark)
    else:
        names = sys.argv[2:] or HEADLINE
        time_queries(spark, names)
    spark.stop()


if __name__ == "__main__":
    main()
