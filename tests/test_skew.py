"""Salted-join correctness + balance on a deliberately skewed key set."""

from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark.operators.skew import hot_keys, salted_join


def _skewed(spark):
    # key 0 holds 5000 rows; keys 1..50 hold ~20 each
    left = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 50 + 1).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(300).select(
        (F.col("id") % 51).alias("k"), F.col("id").alias("rv")
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k").groupBy("k").count().orderBy("k").collect()
    salted = (
        salted_join(left, right, "k", n_salts=4, hot_threshold=1000)
        .groupBy("k")
        .count()
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]


def test_hot_key_detection(spark):
    left, _ = _skewed(spark)
    hk = hot_keys(left, "k", 1000).collect()
    assert [r.k for r in hk] == [0]


def test_salts_spread_hot_key(spark):
    left, right = _skewed(spark)
    hot = F.broadcast(hot_keys(left, "k", 1000).withColumn("_hot", F.lit(True)))
    l = left.join(hot, "k", "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(), F.pmod(F.xxhash64("lv"), F.lit(4))
        ).otherwise(F.lit(0)),
    )
    spread = (
        l.filter(F.col("k") == 0).groupBy("_salt").count().collect()
    )
    counts = {r._salt: r["count"] for r in spread}
    assert len(counts) == 4
    assert max(counts.values()) < 5000 * 0.5  # no salt holds most of the key


def test_left_join_semantics_preserved(spark):
    left, right = _skewed(spark)
    right_missing = right.filter(F.col("k") != 7)  # key 7 unmatched
    plain = (
        left.join(right_missing, "k", "left")
        .groupBy("k")
        .agg(F.count("rv").alias("n"))
        .orderBy("k")
        .collect()
    )
    salted = (
        salted_join(left, right_missing, "k", n_salts=4, hot_threshold=1000, how="left")
        .groupBy("k")
        .agg(F.count("rv").alias("n"))
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]


def test_choose_matches_candidate_cap(spark):
    """Opt-in per-segment candidate cap: with cap >= candidate count the
    output is IDENTICAL to the uncapped chooser; with a forcing cap the
    group size is bounded and kept candidates are the greedy-order prefix."""
    import numpy as np
    from pyspark.sql import functions as F

    from gtfs_conflation_pipeline_spark.operators import spatial_join

    # one segment, 6 disjoint candidates in descending-length order
    rows = []
    for i in range(6):
        rows.append((
            "s", 0, i, f"r{i}", 1,
            i * 0.1, i * 0.1 + 0.09 - i * 0.01,  # disjoint, shrinking
            0.0, 0.09, 0.09 - i * 0.01, 1e-4 * (i + 1), 1e-3, 0.3,
        ))
    refined = spark.createDataFrame(
        rows,
        "shape_id string, shape_index int, segment_id long, shst_reference string,"
        " networklevel int, section_start double, section_end double,"
        " osm_start double, osm_end double, intxn_len_km double,"
        " mean_dev_km double, max_dev_km double, g_len_km double",
    )
    full = spatial_join.choose_matches(refined).collect()
    same = spatial_join.choose_matches(refined, max_candidates_per_segment=10).collect()
    assert sorted(r.segment_id for r in same) == sorted(r.segment_id for r in full)
    capped = spatial_join.choose_matches(refined, max_candidates_per_segment=3).collect()
    assert sorted(r.segment_id for r in capped) == [0, 1, 2]  # greedy-order prefix
