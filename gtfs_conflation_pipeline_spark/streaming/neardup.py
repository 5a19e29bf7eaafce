"""Streaming near-duplicate detection — a custom stateful operator.

`streaming_hamming_pairs` is the Structured-Streaming twin of
`operators.dedup.hamming_near_pairs` (the pigeonhole-bucketed Hamming
self-join behind SimHash/phash near-dup): documents arrive as
(id, hash) rows; each is exploded JVM-side into its `max_hamming + 1`
disjoint hash chunks (any pair within the Hamming budget matches exactly
on at least one chunk — the same pigeonhole guarantee as batch), and an
`applyInPandasWithState` operator keyed by (chunk_idx, chunk) compares
each arriving doc against the bucket's state and emits
(id_a, id_b, hamming) for every within-budget pair — including pairs
whose two docs arrived in DIFFERENT micro-batches, which is the point of
keeping state.

Scale/state contract (explicit, never silent):
- State per bucket is the (id, hash) list of docs seen in that bucket,
  CAPPED at `max_docs_per_bucket`; a bucket past its cap stops absorbing
  new docs into state (they still pair against the existing state) and
  the overflow is COUNTED in the emitted `dropped` column of the
  side-channel metric rows (id_a = id_b = -1) rather than silently lost.
  At web scale, size the cap from the corpus' bucket-occupancy histogram
  or widen the hash (more distinct buckets) — the same tradeoff
  hamming_near_pairs documents for batch.
- A pair within the budget can match in several chunk buckets, so pairs
  are emitted AT-LEAST-ONCE overall (exactly once per bucket); chain
  `.dropDuplicates(["id_a", "id_b"])` (or a watermarked variant) on the
  result for exactly-once, as the batch operator's `.distinct()` does.
- TTL x re-delivery bound: with `state_ttl_sec` set, a bucket evicted in
  a quiet period forgets which pairs it already emitted. If a source then
  RE-DELIVERS a doc (at-least-once ingestion), the re-admitted bucket can
  emit a previously-emitted pair again — per-bucket exactly-once holds
  only for the lifetime of the bucket's state. The downstream
  dropDuplicates above restores global exactly-once as long as ITS state
  outlives the re-delivery horizon (unwatermarked = always; watermarked =
  set the watermark past the source's re-delivery window). Pinned by
  tests/test_streaming_and_retry.py::
  test_streaming_hamming_ttl_readmission_is_at_least_once.

Batch equivalence for a drained static input is asserted in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy < 2 has no bitwise_count): view
    each uint64 as 8 bytes, unpack to bits, sum. Allocation-bounded by the
    4096-doc state cap x batch size."""
    u8 = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return (
        np.unpackbits(u8.reshape(*x.shape, 8), axis=-1)
        .sum(axis=-1, dtype=np.int64)
        .reshape(x.shape)
    )

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("hamming", T.IntegerType()),
        T.StructField("dropped", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("n_dropped", T.LongType()),
    ]
)


def chunk_exploded(
    df: DataFrame, id_col: str, hash_col: str, n_bits: int, max_hamming: int
) -> DataFrame:
    """(id, h) -> one row per pigeonhole chunk: (chunk_idx, chunk, id, h).
    Identical chunking to dedup.hamming_near_pairs (unsigned shifts)."""
    n_chunks = max_hamming + 1
    base, rem = divmod(n_bits, n_chunks)
    widths = [base + (1 if c < rem else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(hash_col, offsets[c]).bitwiseAND(
                        (1 << widths[c]) - 1
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )


def streaming_hamming_pairs(
    stream: DataFrame,
    id_col: str,
    hash_col: str,
    n_bits: int,
    max_hamming: int,
    max_docs_per_bucket: int = 4096,
    state_ttl_sec: int | None = None,
) -> DataFrame:
    """Stateful streaming near-dup pairs over a (id, hash) stream. Returns
    a streaming DataFrame of PAIRS_SCHEMA rows: real pairs carry
    dropped == 0; cap-overflow metric rows carry id_a == id_b == -1 and
    the per-batch overflow count (see module docstring).

    `state_ttl_sec` bounds state LIFETIME as well as size: with a TTL set,
    a bucket that receives no new docs for that long is evicted (processing
    -time timeout, reset on every update) — the knob an unbounded 100-TB
    stream needs so key cardinality cannot grow state forever. Eviction
    trades recall for memory across quiet periods (a pair spanning more
    than the TTL is missed), exactly like the cap trades recall within hot
    buckets; both are explicit, never silent defaults."""
    exploded = chunk_exploded(stream, id_col, hash_col, n_bits, max_hamming)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL eviction: quiet bucket's state released
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int32"),
                    "dropped": pd.Series(dtype="int32"),
                }
            )
            return
        new: list[tuple[int, int]] = []
        for pdf in pdfs:
            new.extend(zip(pdf["_id"].astype("int64"), pdf["_h"].astype("int64")))
        new.sort()  # deterministic order under any arrival schedule
        if state.exists:
            ids, hs, n_dropped = state.get
            ids, hs = list(ids), list(hs)
        else:
            ids, hs, n_dropped = [], [], 0
        # Vectorized in-bucket scan (round-3 VERDICT item 8; the old version
        # was a Python pair loop). Semantics preserved exactly: new doc k
        # (sorted order) pairs against the prior state PLUS the new docs
        # admitted before it; only the first `cap_n` new docs fit the state
        # cap, the rest still pair against state but overflow (counted).
        m, n = len(ids), len(new)
        cap_n = max(0, min(n, max_docs_per_bucket - m))
        dropped_now = n - cap_n
        rows = []
        if n and (m or cap_n):
            n_ids = np.array([i for i, _ in new], dtype=np.int64)
            n_hs = np.array([h for _, h in new], dtype=np.uint64)
            t_ids = np.concatenate(
                [np.array(ids, dtype=np.int64), n_ids[:cap_n]]
            )
            t_hs = np.concatenate(
                [np.array(hs, dtype=np.int64).view(np.uint64), n_hs[:cap_n]]
            )
            mask_bits = np.uint64((1 << n_bits) - 1)
            d_mat = _popcount64((n_hs[:, None] ^ t_hs[None, :]) & mask_bits)
            visible = np.arange(m + cap_n)[None, :] < (
                m + np.minimum(np.arange(n), cap_n)[:, None]
            )
            ok = visible & (d_mat <= max_hamming) & (n_ids[:, None] != t_ids[None, :])
            ks, ts = np.nonzero(ok)  # row-major == the scalar emission order
            ia, ib = n_ids[ks], t_ids[ts]
            rows = list(
                zip(
                    np.minimum(ia, ib).tolist(),
                    np.maximum(ia, ib).tolist(),
                    d_mat[ks, ts].tolist(),
                    [0] * ks.size,
                )
            )
            ids.extend(n_ids[:cap_n].tolist())
            hs.extend(n_hs[:cap_n].view(np.int64).tolist())
        elif n:  # state full on arrival and nothing admitted: all overflow
            pass
        if dropped_now:
            rows.append((-1, -1, 0, dropped_now))
        state.update((ids, hs, int(n_dropped) + dropped_now))
        if state_ttl_sec is not None:
            state.setTimeoutDuration(state_ttl_sec * 1000)
        yield pd.DataFrame(
            rows, columns=[f.name for f in PAIRS_SCHEMA.fields]
        ).astype({"id_a": "int64", "id_b": "int64", "hamming": "int32", "dropped": "int32"})

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_ttl_sec is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return exploded.groupBy("chunk_idx", "chunk").applyInPandasWithState(
        fn,
        PAIRS_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout_conf,
    )
