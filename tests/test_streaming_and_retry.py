"""Streaming windowed-agg equivalence + conflation retry ladder."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators import spatial_join
from gtfs_conflation_pipeline_spark.streaming.windows import (
    dedup_stream,
    epoch_counts_batch,
    epoch_counts_stream,
)


def test_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "stream_src")
    events.repartition(6).write.parquet(src)  # several files -> micro-batches
    batch = (
        epoch_counts_batch(spark.read.parquet(src))
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    q = epoch_counts_stream(
        spark, src, str(tmp_path / "stream_ckpt"), events.schema
    )
    q.awaitTermination(120)
    got = (
        spark.table("epoch_counts").orderBy("window_start", "event_type").toPandas()
    )
    pd.testing.assert_frame_equal(got, batch)


def test_streaming_dedup_equals_batch_distinct(spark, tmp_path):
    """Streaming exact dedup (bounded watermark state): the drained stream
    emits exactly one row per distinct content hash and the hash set equals
    the batch count-distinct."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    # 2x duplication + synthetic event times
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 06:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 600),
    )
    src = str(tmp_path / "dedup_src")
    both.repartition(6).write.parquet(src)
    static = spark.read.parquet(src)
    n_distinct = static.select(F.md5("text")).distinct().count()
    q = dedup_stream(spark, src, str(tmp_path / "dedup_ckpt"), static.schema)
    q.awaitTermination(120)
    got = spark.table("dedup_stream").toPandas()
    assert len(got) == n_distinct
    assert got.content_hash.nunique() == n_distinct


def _mini_net(spark):
    """One straight net segment."""
    xs = [float(x) for x in np.round(np.linspace(-74.0, -73.995, 6), 6)]
    ys = [42.0] * 6
    from gtfs_conflation_pipeline_spark import kernels as K

    return spark.createDataFrame(
        [("shp_x", 0, "a", "b", 0.0, K.polyline_length_km(xs, ys), xs, ys)],
        "shape_id string, shape_index int, from_stop_id string, to_stop_id string,"
        " start_dist_km double, length_km double, xs array<double>, ys array<double>",
    )


def _mini_osm(spark, dy):
    xs = [float(x) for x in np.round(np.linspace(-74.0, -73.995, 6), 6)]
    ys = [42.0 + dy] * 6
    from gtfs_conflation_pipeline_spark import kernels as K

    return spark.createDataFrame(
        [(1, "ref_far", 2, K.polyline_length_km(xs, ys), xs, ys)],
        "segment_id long, shst_reference string, networklevel int,"
        " length_km double, xs array<double>, ys array<double>",
    )


def test_retry_ladder_recovers_offset_map(spark):
    """An OSM segment ~110 m north is outside the 30 m corridor (first pass
    misses) but inside a 150 m retry corridor with a widened k-ring."""
    net = _mini_net(spark)
    osm = _mini_osm(spark, dy=0.001)  # ~110 m offset
    base = spatial_join.conflation_join(net, osm)
    assert base.count() == 0
    retried = spatial_join.conflation_join(
        net, osm, retry_rings=(2,), retry_corridor_km=0.15
    )
    got = retried.collect()
    assert len(got) == 1
    assert got[0].shst_reference == "ref_far"
    assert got[0].mean_dev_km == pytest.approx(0.111, abs=0.01)


def test_retry_ladder_no_double_match(spark):
    """Segments matched in pass 1 are NOT re-matched by the retry pass."""
    net = _mini_net(spark)
    osm_near = _mini_osm(spark, dy=0.0).withColumn(
        "shst_reference", F.lit("ref_near")
    )
    both = osm_near.union(_mini_osm(spark, dy=0.001))
    res = spatial_join.conflation_join(
        net, both, retry_rings=(2,), retry_corridor_km=0.15
    ).collect()
    refs = sorted(r.shst_reference for r in res)
    assert refs == ["ref_near"]  # near match found in pass 1; no retry ran


def test_streaming_hamming_pairs_equals_batch(spark, tmp_path):
    """Stateful streaming near-dup (pigeonhole buckets + per-bucket state):
    drained over a multi-file source (multiple micro-batches, so pairs
    cross batch boundaries through state), the deduped pair set equals
    dedup.hamming_near_pairs on the same static input; no cap overflow."""
    from gtfs_conflation_pipeline_spark.operators import dedup as D
    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        PAIRS_SCHEMA,
        streaming_hamming_pairs,
    )

    rows = []
    base = 0x2E9D_3A5C_71B8
    for i in range(60):
        h = (base * (i // 6 + 1)) & ((1 << 48) - 1)
        # clusters of 6 near-identical hashes (flip i%6 low bits)
        for b in range(i % 6):
            h ^= 1 << b
        rows.append((i, h if h < (1 << 47) else h - (1 << 48)))
    docs = spark.createDataFrame(rows, "id long, h long")
    src = str(tmp_path / "nd_src")
    docs.repartition(5).write.parquet(src)  # 5 files -> several micro-batches

    static = spark.read.parquet(src)
    want = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_near_pairs(
            static, "id", "h", n_bits=48, max_hamming=4
        ).collect()
    }
    assert want  # the fixture actually contains near pairs

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs = streaming_hamming_pairs(
        stream, "id", "h", n_bits=48, max_hamming=4
    )
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("nd_pairs")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_df = spark.table("nd_pairs").toPandas()
    # no silent state overflow
    assert (got_df[got_df.id_a == -1].dropped.sum() if len(got_df) else 0) == 0
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in got_df[got_df.id_a >= 0].itertuples(index=False)
    }
    assert got == want


def test_streaming_hamming_cap_overflow_is_counted(spark, tmp_path):
    """State cap: overflow docs surface as counted metric rows (id_a = -1),
    never silently."""
    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        streaming_hamming_pairs,
    )

    # 10 identical hashes in one bucket, cap 4 -> 6 dropped
    docs = spark.createDataFrame([(i, 12345) for i in range(10)], "id long, h long")
    src = str(tmp_path / "cap_src")
    docs.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs = streaming_hamming_pairs(
        stream, "id", "h", n_bits=48, max_hamming=1, max_docs_per_bucket=4
    )
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("cap_pairs")
        .option("checkpointLocation", str(tmp_path / "cap_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("cap_pairs").toPandas()
    # identical hashes pair within every chunk bucket; cap rows counted
    assert got[got.id_a == -1].dropped.sum() == 6 * 2  # 2 chunks x 6 overflow
    assert (got[got.id_a >= 0].hamming == 0).all()


def test_streaming_hamming_ttl_equivalent_when_not_expired(spark, tmp_path):
    """A generous state TTL (1 h) must not change results: the TTL code
    path (ProcessingTimeTimeout + setTimeoutDuration per update) is
    exercised, eviction never fires within the run."""
    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        streaming_hamming_pairs,
    )

    docs = spark.createDataFrame(
        [(1, 777), (2, 777), (3, 776)], "id long, h long"
    )
    src = str(tmp_path / "ttl_src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs = streaming_hamming_pairs(
        stream, "id", "h", n_bits=48, max_hamming=1, state_ttl_sec=3600
    )
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_pairs")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ttl_pairs").toPandas()
    real = {
        (r.id_a, r.id_b, r.hamming)
        for r in got[got.id_a >= 0].itertuples(index=False)
    }
    assert real == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


def test_streaming_hamming_ttl_evicts_quiet_bucket(spark, tmp_path):
    """Bounded state LIFETIME: with a 1 s TTL and a 6 s quiet gap between
    two single-doc micro-batches, the first doc's bucket state is evicted
    before the near-identical second doc arrives — the cross-gap pair is
    (by design) missed. Empty triggers fire between batches because
    processing-time timeouts keep the query scheduling batches."""
    import time as _t

    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        streaming_hamming_pairs,
    )

    src = str(tmp_path / "evict_src")
    import os as _os

    _os.makedirs(src, exist_ok=True)
    spark.createDataFrame([(1, 555)], "id long, h long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("id long, h long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs = streaming_hamming_pairs(
        stream, "id", "h", n_bits=48, max_hamming=1, state_ttl_sec=1
    )
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("evict_pairs")
        .option("checkpointLocation", str(tmp_path / "evict_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    def _input_rows() -> float:
        return sum(p["numInputRows"] for p in q.recentProgress)

    def _wait_until(pred, timeout_s=120):
        t0 = _t.time()
        while _t.time() - t0 < timeout_s:
            if pred():
                return True
            _t.sleep(0.5)
        return False

    # NOTE: processAllAvailable() cannot be used here — with processing-time
    # timeouts pending, the query keeps scheduling (empty) batches forever
    # and the call never returns. Poll progress counters instead.
    try:
        # doc 1 processed (numInputRows counts SOURCE rows, pre-explode)
        assert _wait_until(lambda: _input_rows() >= 1)
        _t.sleep(6)  # > TTL: empty timeout-driven batches evict the bucket
        spark.createDataFrame([(2, 555)], "id long, h long").coalesce(
            1
        ).write.mode("append").parquet(src)
        assert _wait_until(lambda: _input_rows() >= 2)
        _t.sleep(2)  # let the sink commit doc 2's (empty) output
    finally:
        q.stop()
    got = spark.table("evict_pairs").toPandas()
    assert len(got[got.id_a >= 0]) == 0  # pair across the gap was evicted


def test_streaming_hamming_multichunk_pair_dedupes_to_one(spark, tmp_path):
    """Cross-bucket dedup contract (round-4 VERDICT item 7): a pair whose
    two docs arrive in DIFFERENT micro-batches and whose hashes match in
    EVERY pigeonhole chunk (hamming 0) is emitted once per chunk bucket by
    the stateful operator (at-least-once, as documented) — and the
    documented downstream `.dropDuplicates(["id_a", "id_b"])` chain, whose
    own state also crosses micro-batch boundaries, reduces it to EXACTLY
    one row. Both layers are pinned: the raw sink proves the multi-chunk
    emission actually happened (so the dedup is doing real work), the
    deduped sink proves exactly-once."""
    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        streaming_hamming_pairs,
    )

    # identical 48-bit hashes -> the pair matches in all 3 chunks
    # (max_hamming=2); one doc per file -> one doc per micro-batch
    docs = spark.createDataFrame([(1, 9999), (2, 9999)], "id long, h long")
    src = str(tmp_path / "mc_src")
    docs.repartition(2).write.parquet(src)

    def _run(with_dedup: bool, name: str):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        pairs = streaming_hamming_pairs(
            stream, "id", "h", n_bits=48, max_hamming=2
        )
        if with_dedup:
            pairs = pairs.filter(F.col("id_a") >= 0).dropDuplicates(
                ["id_a", "id_b"]
            )
        q = (
            pairs.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name).toPandas()

    raw = _run(False, "mc_raw")
    raw_pairs = raw[raw.id_a >= 0]
    # premise: the SAME pair really was emitted from multiple chunk buckets
    assert len(raw_pairs) == 3  # one per pigeonhole chunk
    assert set(
        (r.id_a, r.id_b, r.hamming) for r in raw_pairs.itertuples(index=False)
    ) == {(1, 2, 0)}

    deduped = _run(True, "mc_dedup")
    assert len(deduped) == 1
    assert (
        int(deduped.id_a[0]),
        int(deduped.id_b[0]),
        int(deduped.hamming[0]),
    ) == (1, 2, 0)


def test_streaming_hamming_ttl_readmission_is_at_least_once(spark, tmp_path):
    """Adversarial TTL x exactly-once composition (round-5 VERDICT item 6):
    pair (1,2) matches in BOTH pigeonhole chunk buckets; bucket (1,0) is
    kept alive by filler traffic while bucket (0,555) goes quiet past the
    TTL and is evicted. When doc 2 arrives the pair emits ONCE (only the
    surviving bucket still remembers doc 1) — and doc 2 re-populates the
    evicted bucket. A subsequent RE-DELIVERY of doc 1 (at-least-once
    source semantics) then pairs against doc 2 in the re-admitted bucket
    and the pair emits AGAIN: under TTL + re-delivery the operator is
    AT-LEAST-ONCE, exactly as the module docstring bounds it, and the
    documented downstream dropDuplicates(["id_a","id_b"]) restores
    exactly-once. Without re-delivery it stays exactly-once per bucket
    (the round-5 multi-chunk test)."""
    import os as _os
    import time as _t

    from gtfs_conflation_pipeline_spark.streaming.neardup import (
        streaming_hamming_pairs,
    )

    src = str(tmp_path / "readmit_src")
    _os.makedirs(src, exist_ok=True)

    def write(rows):
        spark.createDataFrame(rows, "id long, h long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # h=555: chunk0 = 555, chunk1 = 0 (48 bits, 2 chunks of 24).
    # filler h=3855: chunk1 = 0 (same bucket (1,0) as doc 1 -> keeps it
    # alive), chunk0 = 3855 (different bucket), hamming(3855,555)=6 > 1
    # (never pairs with docs 1/2).
    # Warm-up doc 999 occupies disjoint buckets (0,77)/(1,7): the FIRST
    # micro-batch pays JVM + Python-worker cold start (measured 5.3 s
    # standalone — a large bite out of any real-clock TTL), and a doc whose
    # timeout is set in that batch starts its TTL clock before the operator
    # can process followers. Pay the cold start on a throwaway key, then
    # admit doc 1.
    write([(999, (7 << 24) | 77)])
    stream = (
        spark.readStream.schema("id long, h long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # TTL sizing (second de-flake of this test): the filler cadence must
    # keep bucket (1,0) alive, i.e. every filler-to-filler PROCESSING gap
    # must stay under the TTL. Under full-suite load a single slow parquet
    # write + micro-batch once stretched a gap past the old 6 s TTL and
    # evicted the "kept-alive" bucket too (zero emits). 12 s gives ~5x
    # margin over the ~2-3 s loaded per-filler cadence while the quiet
    # bucket's eviction is enforced by TIME below, not iteration count.
    ttl_sec = 12
    pairs = streaming_hamming_pairs(
        stream, "id", "h", n_bits=48, max_hamming=1, state_ttl_sec=ttl_sec
    )
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName("readmit_pairs")
        .option("checkpointLocation", str(tmp_path / "readmit_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def _input_rows() -> float:
        return sum(p["numInputRows"] for p in q.recentProgress)

    def _pair_rows():
        got = spark.table("readmit_pairs").toPandas()
        return got[(got.id_a == 1) & (got.id_b == 2)]

    def _wait_until(pred, timeout_s=120):
        t0 = _t.time()
        while _t.time() - t0 < timeout_s:
            if pred():
                return True
            _t.sleep(0.4)
        return False

    # processAllAvailable() never returns with processing-time timeouts
    # pending (batches keep scheduling) — poll progress/sink instead.
    try:
        assert _wait_until(lambda: _input_rows() >= 1)  # cold start done
        write([(1, 555)])
        seen = 2
        assert _wait_until(lambda s=seen: _input_rows() >= s)
        t_doc1 = _t.time()
        # keep bucket (1,0) warm with a filler cadence (each iteration waits
        # for its batch, so gaps stay ~2-3 s << ttl) UNTIL bucket (0,555)
        # has been quiet for ttl + 3 s — time-based, so the eviction
        # precondition holds on a fast idle box (which could race through a
        # fixed iteration count inside the TTL) and on a loaded one (where
        # a fixed count at a slow cadence needlessly multiplies exposure).
        k = 0
        while _t.time() - t_doc1 < ttl_sec + 3:
            _t.sleep(0.8)
            write([(100 + k, 3855)])
            k += 1
            seen += 1
            assert _wait_until(lambda s=seen: _input_rows() >= s)
        # doc 2: pairs with doc 1 ONLY via the surviving bucket (1,0);
        # re-populates the evicted bucket (0,555) with itself
        write([(2, 555)])
        seen += 1
        assert _wait_until(lambda s=seen: _input_rows() >= s)
        assert _wait_until(lambda: len(_pair_rows()) >= 1)
        first_emits = len(_pair_rows())
        assert first_emits == 1  # the evicted bucket could NOT dedup-fan-out
        # re-delivery of doc 1 within the TTL: the re-admitted bucket
        # (0,555) holds doc 2 and emits the SAME pair again
        write([(1, 555)])
        seen += 1
        assert _wait_until(lambda s=seen: _input_rows() >= s)
        assert _wait_until(lambda: len(_pair_rows()) > first_emits)
        raw = _pair_rows()
        assert len(raw) >= 2  # at-least-once bound under TTL + re-delivery
        assert set(zip(raw.id_a, raw.id_b, raw.hamming)) == {(1, 2, 0)}
        # the documented exactly-once recovery
        assert len(raw.drop_duplicates(["id_a", "id_b"])) == 1
    finally:
        q.stop()
