"""Embedding-cosine near-dup: LSH-bucketed self-join vs the exact
brute-force sibling, and the image -> embedding -> similarity bridge."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators import multimodal, similarity
from gtfs_conflation_pipeline_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_lsh_neardup_matches_exact_on_constructed_dups(spark):
    """On the perturbed-duplicate fixture (cosine ~0.9999 pairs) the
    LSH-bucketed operator recalls EVERY pair the exact all-pairs sibling
    finds, with identical cosine values (verification is exact)."""
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in Q.q_embedding_neardup(spark, SF).collect()
    }
    emb = Q._emb_with_dups(spark, SF)
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dups(emb, dim=64, threshold=0.9).collect()
    }
    assert len(exact) == 50  # the 50 constructed near-dup pairs
    assert lsh == exact  # subset AND full recall at this cosine level


def test_lsh_neardup_no_false_positives(spark):
    """Candidates are exact-verified: nothing below the threshold leaks."""
    emb = Q._emb_with_dups(spark, SF)
    out = similarity.embedding_near_dups(emb, dim=64, threshold=0.9).toPandas()
    assert (out.cosine >= 0.9).all()
    assert (out.id_a < out.id_b).all()
    assert not out.duplicated(["id_a", "id_b"]).any()


def test_embedding_neardup_plan_has_no_array_below_explode(spark):
    """Scale contract (round-3 VERDICT item 2): candidate generation must
    explode only the narrow (id, sig) signature rows — the embedding array
    must never appear in a Generate (explode) node or the self-join below
    it; vectors attach to SURVIVING pairs via id equi-joins. At 100 TB the
    old multi-probe version amplified the widest column ~300x."""
    emb = Q._emb_with_dups(spark, SF)
    df = similarity.embedding_near_dups(emb, dim=64, threshold=0.9)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen_lines, "expected a posexplode-based candidate generator"
    for ln in gen_lines:
        assert "embedding" not in ln, f"array column crosses the explode: {ln}"
    # and the plan is a pigeonhole equi-join, never a cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_embeddings_deterministic_and_payload_faithful(spark):
    """Identical payloads -> identical embeddings (cosine exactly 1 via the
    near-dup operator); repeat runs bit-identical."""
    img = FX.images_table(spark, 60, partitions=4)
    twin = img.select(
        F.concat(F.col("image_id"), F.lit("_dup")).alias("image_id"),
        "bytes", "w", "h", "fmt",
    )
    both = img.select("image_id", "bytes", "w", "h", "fmt").unionByName(twin)
    emb = multimodal.image_embeddings(both)
    pairs = similarity.embedding_near_dups(
        emb, dim=48, threshold=0.9999, c_id="image_id", c_vec="embedding"
    ).toPandas()
    # every original pairs with its twin at cosine 1.0
    exact_pairs = pairs[pairs.cosine == 1.0]
    twins = {
        (a, b) for a, b in zip(exact_pairs.id_a, exact_pairs.id_b)
        if b == a + "_dup"
    }
    assert len(twins) == 60
    # determinism across runs
    a = emb.orderBy("image_id").toPandas()
    b = multimodal.image_embeddings(both).orderBy("image_id").toPandas()
    for x, y in zip(a.embedding, b.embedding):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_image_embedding_unit_norm(spark):
    img = FX.images_table(spark, 20, partitions=2)
    emb = multimodal.image_embeddings(img).toPandas()
    for v in emb.embedding:
        assert np.linalg.norm(np.asarray(v)) == pytest.approx(1.0, abs=1e-12)
        assert len(v) == 48
