"""Deduplication operators for training-data pipelines.

Exact, n-gram Jaccard, MinHash+LSH, SimHash, and phash-Hamming near-dup over
binary payload tables. Spark-first: shingling/banding are JVM-side array
expressions; only nothing runs in Python.

Scale notes (the point of each design):
- exact_duplicates: one shuffle on the content hash.
- ngram Jaccard: |shingle| x doc explode, self-join on shingle, pair-count
  agg -> Jaccard. Hot shingles are the skew hazard; `max_shingle_freq`
  drops shingles occurring in more than N docs (standard df-cut), which
  bounds the pair blowup at web scale.
- MinHash LSH: per-doc signature (k hashes over shingle set, JVM-side
  aggregate), banded into b buckets; candidates = equi-join on
  (band, band_hash) -> exact-verify. Join key count per doc = b,
  independent of document length — the 100 TB-safe path.
- SimHash: 64-bit sign-aggregate of word hashes; near-dups = hamming <= t
  via bit_count(xor). Bucketed by 16-bit chunks (pigeonhole) to avoid the
  quadratic scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_hash, words

P64 = (1 << 61) - 1  # Mersenne prime for the hash family


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents (hash-groupBy on md5)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.concat_ws(",", F.array_sort(F.collect_list(F.col(id_col).cast("string")))).alias(
                "doc_ids"
            ),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles(text, n: int = 3):
    """Word n-gram shingle set as array<string> (distinct)."""
    w = words(text)
    k = F.size(w) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    salt_hot_shingles: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >= threshold).

    Skew guards for web scale: df-cut (`max_shingle_freq`) drops ubiquitous
    shingles before the self-join; `salt_hot_shingles` additionally routes
    the self-join through the explicit salted join (operators.skew) with
    that salt factor — for shingles that are hot but below the df-cut.
    """
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(F.broadcast(freq.filter(F.col("df_") <= max_shingle_freq)), "sh")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc").alias("id_a"), "sh")
    b = sh.select(F.col("doc").alias("id_b"), "sh")
    if salt_hot_shingles:
        from .skew import salted_join

        joined = salted_join(
            a, b, "sh", n_salts=salt_hot_shingles, hot_threshold=1000, salt_cols=["id_a"]
        )
    else:
        joined = a.join(b, "sh")
    inter = (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 32
) -> DataFrame:
    """k-permutation MinHash signature per doc, fully JVM-side:
    sig_i = min over shingles of ((a_i * h(sh) + b_i) mod P64), with a fixed
    deterministic hash family (splitmix-style odd constants)."""
    sh_hash = F.transform(
        shingles(F.col(text_col), n), lambda s: word_hash(s)
    )
    perms = [
        (2 * i + 1, (i * 0x9E3779B9) % P64) for i in range(1, k + 1)
    ]  # deterministic (a, b) family
    sig = F.array(
        *[
            F.array_min(
                F.transform(sh_hash, lambda h: (h * a + b) % F.lit(P64))
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(perms)
        ]
    )
    return df.select(F.col(id_col).alias("doc"), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, exact-verified with true Jaccard.

    bands x rows layout (k = bands*rows): docs sharing any band bucket are
    candidates; candidates are then verified with the exact n-gram Jaccard,
    so false positives vanish and only LSH misses can differ from the exact
    operator (probabilistic recall — tune bands/k).
    """
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, n=n, k=k)
    banded = sigs.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows + 1, rows)).alias(f"b{b}")
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return cands.join(exact, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc from word hashes, JVM-side.

    bit_j(simhash) = majority sign of bit_j over the doc's word hashes.
    Computed via aggregate over 64 bit-count sums expressed as a single
    array expression (no Python).
    """
    wh = F.transform(words(F.col(text_col)), lambda w: word_hash(w))
    # votes_j = sum over words of bit_j; bit set iff votes*2 > n_words
    n = F.size(wh)
    def _vote(j: int):
        def fold(acc, h):
            return acc + F.shiftright(h, j).bitwiseAND(1)

        return fold

    sim = F.lit(0).cast("long")
    for j in range(48):
        bit_j = (
            (F.aggregate(wh, F.lit(0).cast("long"), _vote(j)) * 2) > n
        ).cast("long")
        sim = sim.bitwiseOR(F.shiftleft(bit_j, j))
    return df.select(F.col(id_col).alias("doc"), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, pigeonhole-bucketed:
    split the 48-bit hash into 4 x 12-bit chunks; any pair within
    max_hamming<=3-per-chunk shares at least one exact chunk -> equi-join per
    chunk, then verify hamming via bit_count(xor)."""
    sigs = simhash64(df, id_col, text_col)
    chunks = sigs.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 12 * c).bitwiseAND((1 << 12) - 1)
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    pairs = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk_idx", "chunk"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


def phash_near_dups(images: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual-hash near-duplicate image pairs (binary-payload analog of
    simhash_near_pairs): pigeonhole on 16-bit phash chunks, verify with
    bit_count(xor). Input: the input_hint images table (image_id, phash)."""
    chunks = images.select(
        "image_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", 16 * c).bitwiseAND((1 << 16) - 1)
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    return (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk_idx", "chunk"])
        .filter(F.col("x.image_id") < F.col("y.image_id"))
        .select(
            F.col("x.image_id").alias("id_a"),
            F.col("y.image_id").alias("id_b"),
            F.col("x.phash").alias("pa"),
            F.col("y.phash").alias("pb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
