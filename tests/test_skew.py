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
