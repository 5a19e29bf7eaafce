"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen) — no Python on
the hot path. Tokenization contract: whitespace split, which is also what the
DuckDB oracles use, so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small embedded stopword list — the lang-ID heuristic's evidence set
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "it"]

FNV_MOD = 1_000_000_007


def words(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def distinct_ratio(text: Column) -> Column:
    """Vocabulary richness: distinct words / words."""
    w = words(text)
    return F.size(F.array_distinct(w)) / F.size(w)


def stopword_ratio(text: Column) -> Column:
    w = words(text)
    hits = F.size(F.filter(w, lambda x: x.isin(EN_STOPWORDS)))
    return hits / F.size(w)


def quality_score_raw(text: Column) -> Column:
    """Composite quality in [0,1]: penalize tiny docs, low vocabulary
    diversity, and stopword-free (non-language) strings. Unrounded — the
    components are small rationals that land on exact decimal ties, where
    engines' rounding modes differ; round/floor at the consumer."""
    w = words(text)
    n = F.size(w)
    avg_len = F.length(F.regexp_replace(text, " ", "")) / n
    return (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + distinct_ratio(text) * 0.3
        + F.least(stopword_ratio(text) * 5.0, F.lit(1.0)) * 0.2
        + F.least(avg_len / F.lit(8.0), F.lit(1.0)) * 0.1
    )


def quality_score(text: Column) -> Column:
    """Rounded (4 dp) quality score for human-facing use."""
    return F.round(quality_score_raw(text), 4)


def lang_id(text: Column) -> Column:
    """N-gram/stopword language heuristic: >=3 English stopword hits -> 'en'."""
    w = words(text)
    hits = F.size(F.filter(w, lambda x: x.isin(EN_STOPWORDS)))
    return F.when(hits >= 3, F.lit("en")).otherwise(F.lit("other"))


BPE_PIECE_LEN = 4  # empirical subword length (~4 chars/token for English BPEs)


def regex_tokens(text: Column) -> Column:
    """Regex tokenization: alphanumeric runs + single punctuation marks
    (ASCII classes — identical semantics in Spark's Java regex and
    DuckDB's RE2, keeping the oracle portable)."""
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token count estimate: each regex token contributes
    ceil(len/BPE_PIECE_LEN) subword pieces — the standard
    chars-per-token approximation for budgeting LLM training data when the
    real tokenizer isn't on the cluster. Pure JVM HOF arithmetic."""
    toks = regex_tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.ceil(F.length(t) / F.lit(float(BPE_PIECE_LEN))).cast("long"),
    )


def word_hash(word: Column) -> Column:
    """Portable 48-bit word hash: first 12 hex chars of md5, as a long.
    Identical in DuckDB: ('0x' || substr(md5(w), 1, 12))::BIGINT."""
    return F.conv(F.substring(F.md5(word), 1, 12), 16, 10).cast("long")


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Position-weighted rolling document fingerprint:
    sum over words of (md5_48(word) % p) * position, p = 1e9+7.

    Order-sensitive (a shuffled document fingerprints differently) yet
    exactly portable to ANSI SQL via unnest-with-ordinality.
    """
    e = df.select(
        id_col, F.posexplode(words(F.col(text_col))).alias("pos", "w")
    )
    return e.groupBy(id_col).agg(
        F.sum((word_hash(F.col("w")) % FNV_MOD) * (F.col("pos") + 1)).alias(
            "fingerprint"
        )
    )
