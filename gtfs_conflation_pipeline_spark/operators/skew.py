"""Explicit salted-key skew handling (north-rule requirement).

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew; this module is the EXPLICIT variant for keys so hot that even
split partitions overwhelm a task — urban-core cells in the conflation join,
viral documents in dedup shingle joins.

Pattern (classic two-sided salting):
  - pre-pass approx count per key finds keys above `hot_threshold`
  - LEFT hot rows get a deterministic salt in [0, n_salts) derived from the
    row itself (xxhash64 of salt_cols — no RNG, reproducible),
  - RIGHT hot rows are replicated across ALL salts (explode),
  - join on (key, salt); cold keys use salt 0 on both sides, so the result
    is identical to the unsalted join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Keys whose row count exceeds hot_threshold (approx pre-pass)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_threshold)
        .select(key)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on `key`. Result rows == plain join rows.

    Supported join types: inner, left (and their aliases). right/full would
    emit one null-padded row PER SALT REPLICA for unmatched hot right rows;
    salt the other side instead."""
    if how.replace("_outer", "").replace("outer", "left") not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    hot = F.broadcast(
        hot_keys(left, key, hot_threshold).withColumn("_hot", F.lit(True))
    )
    sc = salt_cols or [c for c in left.columns if c != key]
    l_salt = F.when(
        F.col("_hot").isNotNull(),
        F.pmod(F.xxhash64(*[F.col(c) for c in sc]), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    l = (
        left.join(hot, key, "left")
        .withColumn("_salt", l_salt.cast("int"))
        .drop("_hot")
    )
    r_salts = F.when(
        F.col("_hot").isNotNull(),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    r = (
        right.join(hot, key, "left")
        .select("*", F.explode(r_salts).alias("_salt"))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_hot")
    )
    return l.join(r, [key, "_salt"], how).drop("_salt")
