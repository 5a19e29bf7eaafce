"""Recall / scale-contract tests for the LSH dedup + ANN family.

Round-2 verdict items: the pigeonhole bucketing must find EVERY pair within
its own max_hamming budget (chunks = max_hamming+1), minhash verification
must agree with the exact operator on candidates, and lsh_ann's multi-probe
equi-join must be semantically identical to the brute-force hamming filter
it replaces.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark.operators import dedup, similarity


def _signed64(v: int) -> int:
    """Wrap an unsigned 64-bit int into Spark's signed long range."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _brute_hamming_pairs(spark, rows, max_hamming):
    """O(n^2) oracle: all id pairs with bit_count(xor) <= max_hamming."""
    df = spark.createDataFrame(rows, "id long, h long")
    a = df.select(F.col("id").alias("id_a"), F.col("h").alias("ha"))
    b = df.select(F.col("id").alias("id_b"), F.col("h").alias("hb"))
    return {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .collect()
    }


def _spread_bits(base: int, n_bits: int, n_chunks: int, h: int) -> int:
    """Flip h bits of `base`, one in each of the first h pigeonhole chunks —
    the adversarial case the old 4-chunk bucketing provably missed."""
    widths = [n_bits // n_chunks + (1 if c < n_bits % n_chunks else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    out = base
    for c in range(h):
        out ^= 1 << offsets[c]
    return out


@pytest.mark.parametrize("n_bits,max_hamming", [(48, 6), (64, 4), (64, 3)])
def test_hamming_near_pairs_exact_recall_adversarial(spark, n_bits, max_hamming):
    """Pairs differing in exactly max_hamming bits spread across ALL
    max_hamming+1 chunks (one per chunk for the first h chunks) must be
    found — the pigeonhole guarantee the round-1 fixed-4-chunk version
    broke."""
    n_chunks = max_hamming + 1
    base_vals = [0x2E9D_3A5C_71B8 & ((1 << n_bits) - 1), 0, (1 << n_bits) - 1]
    rows = []
    i = 0
    for base in base_vals:
        rows.append((i, _signed64(base))); i += 1
        # exactly-h spread across chunks (worst case)
        rows.append((i, _signed64(_spread_bits(base, n_bits, n_chunks, max_hamming)))); i += 1
        # h+1 spread: must NOT match the budget
        if max_hamming + 1 <= n_chunks:
            rows.append((i, _signed64(_spread_bits(base, n_bits, n_chunks, max_hamming + 1) ^ (1 << (n_bits - 1))))); i += 1
        # a near-identical pair (hamming 1)
        rows.append((i, _signed64(base ^ 2))); i += 1
    # some unrelated fillers
    for j in range(12):
        rows.append((i, _signed64((j * 0x9E3779B97F4A7C15) & ((1 << n_bits) - 1)))); i += 1

    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.hamming_near_pairs(
            df, "id", "h", n_bits=n_bits, max_hamming=max_hamming
        ).collect()
    }
    want = _brute_hamming_pairs(spark, rows, max_hamming)
    assert got == want
    # the adversarial exact-h pair is actually present in the oracle set
    assert any(h == max_hamming for (_, _, h) in want)


def test_hamming_near_pairs_rejects_underchunking(spark):
    df = spark.createDataFrame([(1, 5)], "id long, h long")
    with pytest.raises(ValueError):
        dedup.hamming_near_pairs(df, "id", "h", n_bits=48, max_hamming=6, n_chunks=4)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup
        (2, base.replace("lazy", "sleepy")),  # near dup
        (3, "completely different words about spark partitions and shuffles here now"),
        (4, base + " with a small suffix added"),
        (5, "completely different words about spark partitions and shuffles here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_verification_matches_exact_on_candidates(spark):
    """Every pair minhash_lsh emits must carry the SAME jaccard the exact
    operator computes (candidates-only verification is still exact), and on
    this high-similarity fixture recall is 1."""
    df = _docs(spark)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    # near-identical docs must be recalled by 8 bands x 4 rows
    assert (0, 1) in lsh and (3, 5) in lsh


def test_minhash_plan_has_no_shingle_selfjoin(spark):
    """Scale contract: the LSH plan must NOT contain the exact operator's
    shingle self-join. Detect via the explain output — the exact plan joins
    on the shingle string column `sh`; the LSH plan joins on
    (band, bucket) and doc ids only."""
    df = _docs(spark)
    plan = dedup.minhash_lsh_pairs(df, "doc_id", "text")._jdf.queryExecution().toString()
    assert "n_common" not in plan  # pair-count agg only exists in the exact op


def test_simhash_and_phash_defaults_are_recall_safe(spark):
    """simhash_near_pairs(max_hamming=6) and phash_near_dups(max_hamming=4)
    equal their brute-force siblings on a corpus with engineered
    spread-bit hashes embedded via controlled text/phash inputs."""
    # phash: direct hash control
    rows = [(i, _signed64(v)) for i, v in enumerate(
        [0xDEADBEEFCAFE, _spread_bits(0xDEADBEEFCAFE, 64, 5, 4),
         0x12345678, 0x12345678 ^ 0b11111, 7, 7 ^ (1 << 63)]
    )]
    img = spark.createDataFrame(rows, "image_id long, phash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.phash_near_dups(img, max_hamming=4).collect()
    }
    want = _brute_hamming_pairs(
        spark, [(i, v) for i, v in rows], 4
    )
    assert got == want and len(want) >= 2

    # simhash: text in, assert pigeonhole output == brute force on the hashes
    df = _docs(spark)
    sigs = dedup.simhash48(df, "doc_id", "text")
    hrows = [(r.doc, r.simhash) for r in sigs.collect()]
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=6).collect()
    }
    want = _brute_hamming_pairs(spark, hrows, 6)
    assert got == want


def test_lsh_ann_multiprobe_equals_bruteforce_hamming(spark):
    """The multi-probe signature equi-join must return EXACTLY the same
    top-k as the brute-force hamming-filtered rerank it replaced (the mask
    set enumerates the full hamming ball)."""
    import math

    dim, n_planes, t = 16, 12, 2
    vecs = [
        (i, [math.sin(0.3 * i + 0.1 * d) for d in range(dim)]) for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {
        (r.qid, r.vec_id, r.cosine, r.rank)
        for r in similarity.lsh_ann_topk(
            q, emb, dim=dim, k=3, n_planes=n_planes, probe_hamming=t
        ).collect()
    }
    # brute-force sibling with identical semantics
    planes = similarity._hyperplanes(dim, n_planes)
    csig = emb.withColumn("sig", similarity.signature_bits(F.col("embedding"), planes))
    qsig = q.withColumn("qsig", similarity.signature_bits(F.col("qvec"), planes))
    cands = csig.crossJoin(F.broadcast(qsig)).filter(
        (F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= t)
        & (F.col("qid") != F.col("vec_id"))
    )
    want = {
        (r.qid, r.vec_id, r.cosine, r.rank)
        for r in similarity._cosine_rerank(
            cands, "qid", "vec_id", "qvec", "embedding", 3
        ).collect()
    }
    assert got == want and len(got) > 0


def test_lsh_ann_plan_is_equijoin_not_crossjoin(spark):
    import math

    dim = 8
    vecs = [(i, [math.cos(i + d) for d in range(dim)]) for i in range(10)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = (
        similarity.lsh_ann_topk(q, emb, dim=dim, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_ann_plan_has_no_vector_below_explode(spark):
    """Scale contract (round-3 VERDICT item 3): the multi-probe explode and
    the sig equi-join must carry only (qid, sig) longs — the query vector
    attaches to SURVIVING candidates by a qid equi-join. The old plan
    broadcast 79 copies of every query vector (79x queries x dim doubles)."""
    import math

    dim = 8
    vecs = [(i, [math.cos(i + d) for d in range(dim)]) for i in range(10)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = (
        similarity.lsh_ann_topk(q, emb, dim=dim, k=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen_lines, "expected an explode-based multi-probe generator"
    for ln in gen_lines:
        assert "qvec" not in ln, f"query vector crosses the probe explode: {ln}"


def test_ngram_auto_df_cut_engages_and_reports(spark):
    """Default-on skew guard: above the doc-count threshold the df-cut
    engages automatically, pair counts stay bounded, and the drop count is
    recorded (no silent caps)."""
    hot = "common common common"  # one ubiquitous shingle in every doc
    rows = [(i, hot + f" unique{i} tail{i} word{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.05, auto_df_cut_min_docs=10
    )
    n_pairs = out.count()
    m = dedup.LAST_METRICS["ngram_jaccard"]
    assert m["df_cut"] == dedup.AUTO_MAX_SHINGLE_FREQ or m["df_cut"] == 1000
    assert "dropped_shingles" in m
    # df-cut threshold (1000) > 40 docs, so nothing dropped here — force a
    # low explicit cut and check the hot shingle actually gets dropped
    out2 = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.05, max_shingle_freq=10
    )
    n_pairs2 = out2.count()
    m2 = dedup.LAST_METRICS["ngram_jaccard"]
    assert m2["dropped_shingles"] >= 1
    assert n_pairs2 <= n_pairs


def test_df_cut_construction_launches_no_jobs(spark):
    """Laziness contract (round-3 VERDICT item 7): building the pairs
    DataFrame with a df-cut must launch ZERO Spark jobs; the dropped-shingle
    metric resolves on first LAST_METRICS read (cache-hit after the caller's
    own action)."""
    rows = [(i, "common common common " + f"u{i} v{i} w{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sc = spark.sparkContext
    sc.setJobGroup("dfcut_construct", "construction must launch no jobs")
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.05, max_shingle_freq=10
    )
    jobs = sc.statusTracker().getJobIdsForGroup("dfcut_construct")
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == [], "df-cut construction ran eager Spark jobs"
    out.count()
    m = dedup.LAST_METRICS["ngram_jaccard"]
    assert m["dropped_shingles"] >= 1  # the ubiquitous shingle was dropped


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_dedup_clusters_match_union_find(spark):
    """Min-label propagation == union-find on chains, cliques, a long path
    (multi-iteration convergence) and isolated pairs."""
    pairs = (
        [(1, 2), (2, 3), (3, 4)]            # chain
        + [(10, 11), (10, 12), (11, 12)]     # clique
        + [(20, 21)]                          # isolated pair
        + [(i, i + 1) for i in range(30, 40)]  # long path (diameter 10)
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(df).collect()}
    want = _union_find_oracle(pairs)
    assert got == want
    assert dedup.LAST_METRICS["dedup_clusters"]["last_changed"] == 0


def test_dedup_clusters_reliable_checkpoint_mode(spark, tmp_path):
    """Union-find oracle holds in the reliable-checkpoint mode too (the
    cluster-durable lineage truncation for executor-loss survival)."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster
        for r in dedup.dedup_clusters(
            df, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == _union_find_oracle(pairs)


def test_dedup_clusters_long_chain_converges_via_pointer_jumping(spark):
    """A 200-node chain (diameter 199) must converge well inside the default
    20-iteration budget — the pointer-jump shortcut makes convergence
    O(log d), not O(d). Round-3 ADVICE: long near-dup chains (templated
    docs with drifting content) are realistic at web scale."""
    pairs = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(df).collect()}
    assert got == _union_find_oracle(pairs)
    m = dedup.LAST_METRICS["dedup_clusters"]
    assert m["converged"] is True
    assert m["iterations"] <= 10  # log2(200) ~ 8, not 199


def test_dedup_clusters_nonconvergence_is_never_silent(spark):
    """Exhausting the iteration budget with labels still changing must
    surface: converged=False in LAST_METRICS, RuntimeError with strict."""
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    dedup.dedup_clusters(df, max_iters=2)
    assert dedup.LAST_METRICS["dedup_clusters"]["converged"] is False
    with _pytest.raises(RuntimeError, match="did NOT converge"):
        dedup.dedup_clusters(df, max_iters=2, strict=True)


def test_keep_canonical_drops_all_but_min(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    clusters = dedup.dedup_clusters(pairs)
    kept = dedup.keep_canonical(docs, clusters)
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}


def test_ngram_plan_tokenizes_once(spark):
    """Plan contract (round-3, re-pinned for the round-7 PPJoin shape): the
    shingle TOKENIZE explode is computed once and cached — every consumer
    (both prefix sides of the candidate join, both verify sides) reads the
    persisted sorted-array relation. Tokenize Generates
    (explode over split(text...)) may appear only as the cached plan each
    InMemoryRelation prints; the only uncached Generates are the prefix
    explodes over `pfx` — a cheap slice of the cached array, not a
    re-tokenize."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " + str(i))
         for i in range(30)],
        "doc_id long, text string",
    )
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_cached = plan.count("InMemoryRelation")
    assert n_cached >= 4  # two prefix sides + two verify sides
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    tokenize = [ln for ln in gen_lines if "split(text" in ln]
    other = [ln for ln in gen_lines if "split(text" not in ln]
    assert len(tokenize) <= n_cached, (
        f"{len(tokenize) - n_cached} uncached tokenize pass(es) in the plan"
    )
    assert other and all("explode(pfx" in ln for ln in other), other


def test_ngram_prefix_filter_matches_bruteforce_on_random_corpora(spark):
    """PPJoin recall contract (round 7): the prefix-filtered candidate join
    must emit EXACTLY the pairs (and jaccard values) a brute-force
    all-pairs computation over the same word-3-gram shingle sets produces —
    a missed candidate would be a silently wrong row, so this is pinned on
    adversarial randomized corpora (shared prefixes, duplicated docs, tiny
    docs whose prefix is the whole set, mixed lengths) at several
    thresholds."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(40)]
    for trial, thr in [(0, 0.3), (1, 0.5), (2, 0.8), (3, 0.05)]:
        rows = []
        for i in range(28):
            n_words = rng.choice([3, 4, 8, 15, 25])
            base = [rng.choice(vocab) for _ in range(n_words)]
            rows.append((i, " ".join(base)))
            if i % 5 == 0:  # near-duplicate: perturb one word
                dup = list(base)
                dup[rng.randrange(len(dup))] = rng.choice(vocab)
                rows.append((100 + i, " ".join(dup)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=thr
            ).collect()
        }
        # brute force over the same shingle definition (distinct word
        # 3-grams; hashing is injective here because we compare SETS built
        # from the same strings)
        def shingle_set(text):
            w = text.split(" ")
            k = max(len(w) - 2, 1)
            return {" ".join(w[i : i + 3]) for i in range(k) if i + 2 < len(w)} or {
                " ".join(w[0:3])
            }
        sets = {i: shingle_set(t) for i, t in rows}
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 4)
            if j >= thr:
                want[(a, b)] = j
        assert got == want, (
            f"trial {trial} thr {thr}: missing {set(want) - set(got)}, "
            f"extra {set(got) - set(want)}"
        )
