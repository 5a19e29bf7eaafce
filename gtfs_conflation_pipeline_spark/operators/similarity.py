"""Similarity search over embedding columns (array<float|double>).

Brute-force cosine top-k as the exact baseline; an LSH-bucketed (random
hyperplane / sign-LSH) variant as the 100 TB scale path. Dot products are
JVM-side higher-order functions (zip_with + aggregate) — no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    q_id: str = "qid",
    q_vec: str = "qvec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k. queries is expected to be small
    (broadcast); corpus is the big side — the join is a broadcast
    nested-loop, embarrassingly parallel over corpus partitions, no shuffle
    until the final per-query top-k (tiny)."""
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(q_id) != F.col(c_id)
    )
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            _dot(F.col(q_vec), F.col(c_vec))
            / (_norm(F.col(q_vec)) * _norm(F.col(c_vec))),
            round_dp,
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no RNG state: values
    from a fixed trigonometric sequence — reproducible everywhere)."""
    return [
        [math.sin(0.7 * (p * dim + d) + 0.3) for d in range(dim)]
        for p in range(n_planes)
    ]


def signature_bits(vec, planes: list[list[float]]):
    """Sign-LSH signature as a long (bit p = sign of <vec, plane_p>)."""
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in plane]),
                    lambda v, p: v * p,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        for plane in planes
    ]
    out = F.lit(0).cast("long")
    for j, b in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(b, j))
    return out


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 12,
    probe_hamming: int = 2,
    q_id: str = "qid",
    q_vec: str = "qvec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, then exact cosine re-rank
    within candidates whose signature hamming <= probe_hamming.

    At scale the corpus is scanned once to materialize (signature, vec) and
    all probing is an equi-join on a single long key per multi-probe offset
    — candidate count per query is O(bucket size), not O(N).
    """
    planes = _hyperplanes(dim, n_planes)
    csig = corpus.withColumn("sig", signature_bits(F.col(c_vec), planes))
    qsig = queries.withColumn("qsig", signature_bits(F.col(q_vec), planes))
    cands = csig.crossJoin(F.broadcast(qsig)).filter(
        (F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= probe_hamming)
        & (F.col(q_id) != F.col(c_id))
    )
    scored = cands.select(
        q_id,
        c_id,
        F.round(
            _dot(F.col(q_vec), F.col(c_vec))
            / (_norm(F.col(q_vec)) * _norm(F.col(c_vec))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )
