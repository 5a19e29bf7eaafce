"""Multimodal (image/audio/video) column operators.

Payloads are opaque `binary` columns with typed metadata beside them (the
input_hint schema: bytes/w/h/fmt). The Spark-side plumbing — schemas,
Arrow batch shapes, partitioning — is real and tested. Codecs:

- 'raw'  — C-order uint8 buffer (lossless, real).
- 'qraw' — 2-bit-quantized raw (deterministic lossy stand-in).
- 'dct'  — REAL lossy block-DCT codec, pure numpy (round-3; entropy stage
  upgraded round-5): JPEG-style 8x8 DCT-II with the public IJG
  quality-scaled luminance quantization table, then a genuine
  JPEG-baseline-style entropy stage — zigzag scan, DC DPCM + AC
  (run, size) symbols with ZRL/EOB, canonical Huffman tables
  (length-limited to 16 bits, ITU T.81 K.3 adjustment) built per payload
  and carried in the header. Encode is fully numpy-vectorized (token
  construction + variable-length bit packing via bitwise_or.at); decode's
  token loop is the inherently sequential part of any entropy codec (a
  SIMD/C decoder plugs into the same seam on a real cluster). The legacy
  packbits-mask format ('DCT1') still decodes. No external image library
  needed — the decode -> feature-extract path runs end-to-end on
  genuinely compressed payloads in this container.
- anything else (jpeg/png/webp hardware paths) raises NotImplementedError
  at the decode seam, clearly marked — a turbojpeg/PIL codec plugs into
  the same `decode_image` function on a cluster that ships one.

All operators are mapInPandas over Arrow batches — bytes never pass through
per-row Python UDFs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("min_px", T.IntegerType()),
        T.StructField("max_px", T.IntegerType()),
    ]
)


# --- pure-numpy 8x8 block-DCT codec ('dct') --------------------------------

# Standard JPEG luminance quantization table (public, IJG / ITU T.81 K.1);
# applied to all three channels for simplicity (documented deviation from
# JPEG's chroma handling — this is a codec for the decode seam, not JFIF).
_JPEG_Q50 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

_DCT_MAGIC = b"DCT1"


def _dct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: D[i,j] = c_i cos((2j+1) i pi/16)."""
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    D = np.cos((2 * j + 1) * i * np.pi / 16.0)
    D[0] *= np.sqrt(1.0 / 8.0)
    D[1:] *= np.sqrt(2.0 / 8.0)
    return D


_D = _dct_mat()


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the base table (quality 1..100)."""
    q = int(min(max(quality, 1), 100))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    return np.clip(np.floor((_JPEG_Q50 * scale + 50.0) / 100.0), 1.0, 255.0)


def _to_blocks(px: np.ndarray):
    """(w, h, 3) uint8 -> (3*nb, 8, 8) float64 blocks + padded dims."""
    w, h, _ = px.shape
    pw, ph = -(-w // 8) * 8, -(-h // 8) * 8
    padded = np.pad(px, ((0, pw - w), (0, ph - h), (0, 0)), mode="edge")
    # channel-major deterministic block order
    b = padded.transpose(2, 0, 1).reshape(3, pw // 8, 8, ph // 8, 8)
    return (
        b.transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8).astype(np.float64),
        pw,
        ph,
    )


def _from_blocks(blocks: np.ndarray, w: int, h: int, pw: int, ph: int) -> np.ndarray:
    b = blocks.reshape(3, pw // 8, ph // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return b.reshape(3, pw, ph).transpose(1, 2, 0)[:w, :h, :]


# zigzag scan order: position k in the scan -> row-major index in the 8x8
# block (the standard JPEG order, derived once from the (row+col, diagonal
# direction) rule rather than hard-coded so it is self-checking)
def _zigzag_order() -> np.ndarray:
    idx = sorted(
        range(64),
        key=lambda i: (
            (i // 8) + (i % 8),  # anti-diagonal
            (i % 8) if ((i // 8) + (i % 8)) % 2 else (i // 8),  # direction
        ),
    )
    return np.array(idx, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_DCT2_MAGIC = b"DCT2"


def _bit_size(a: np.ndarray) -> np.ndarray:
    """JPEG size category: bit length of |v| (0 for 0). Exact via frexp."""
    a = np.abs(a.astype(np.int64))
    return np.where(a == 0, 0, np.frexp(a.astype(np.float64))[1]).astype(np.int64)


def _huff_lengths(freq: np.ndarray, max_len: int = 16) -> np.ndarray:
    """Canonical-Huffman code lengths from symbol frequencies, length-limited
    to `max_len` with the ITU T.81 K.3 BITS adjustment. Returns lengths
    (0 = symbol unused). Alphabet is tiny (<= 256), plain heapq is fine."""
    import heapq

    syms = np.nonzero(freq)[0]
    if syms.size == 0:
        return np.zeros(freq.size, dtype=np.int64)
    if syms.size == 1:
        out = np.zeros(freq.size, dtype=np.int64)
        out[syms[0]] = 1
        return out
    # Huffman tree -> depth per symbol (ties broken by symbol value for
    # determinism)
    heap = [(int(freq[s]), int(s), [int(s)]) for s in syms]
    heapq.heapify(heap)
    depth = np.zeros(freq.size, dtype=np.int64)
    while len(heap) > 1:
        fa, ta, la = heapq.heappop(heap)
        fb, tb, lb = heapq.heappop(heap)
        for s in la + lb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, min(ta, tb), la + lb))
    # length-limit (T.81 K.3): move a pair of leaves up from over-long depths
    counts = np.bincount(depth[syms], minlength=max(depth.max() + 1, max_len + 2))
    for ln in range(len(counts) - 1, max_len, -1):
        while counts[ln] > 0:
            j = ln - 2
            while counts[j] == 0:
                j -= 1
            counts[ln] -= 2
            counts[ln - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
    # re-deal lengths: symbols sorted by (orig depth, symbol) get the new
    # lengths in ascending order — Kraft-preserving, deterministic
    order = syms[np.lexsort((syms, depth[syms]))]
    new_lens = np.repeat(
        np.arange(len(counts), dtype=np.int64), counts.astype(np.int64)
    )
    out = np.zeros(freq.size, dtype=np.int64)
    out[order] = new_lens  # np.repeat output is already ascending
    return out


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical code per symbol from lengths (symbols ordered by
    (length, symbol value) — the convention both sides share)."""
    codes = np.zeros(lengths.size, dtype=np.int64)
    code = 0
    prev_len = 0
    for s in np.lexsort((np.arange(lengths.size), lengths)):
        ln = int(lengths[s])
        if ln == 0:
            continue
        code <<= ln - prev_len
        codes[s] = code
        code += 1
        prev_len = ln
    return codes


def _pack_table(lengths: np.ndarray) -> bytes:
    """Serialize a canonical table as 16 per-length counts + the symbol
    list in (length, symbol) order — the JPEG DHT layout."""
    counts = np.bincount(lengths[lengths > 0], minlength=17)[1:17]
    syms = np.lexsort((np.arange(lengths.size), lengths))
    syms = syms[lengths[syms] > 0]
    return counts.astype(np.uint8).tobytes() + syms.astype(np.uint8).tobytes()


def _unpack_table(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    counts = np.frombuffer(buf, dtype=np.uint8, count=16, offset=off)
    n = int(counts.sum())
    syms = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off + 16)
    lengths = np.zeros(256, dtype=np.int64)
    lengths[syms] = np.repeat(np.arange(1, 17, dtype=np.int64), counts)
    return lengths, off + 16 + n


def _pack_bits(full: np.ndarray, fulllen: np.ndarray) -> tuple[bytes, int]:
    """MSB-first variable-length bit packing, fully vectorized: each token's
    (value, bit-length) lands at its cumulative bit offset via an 8-byte
    big-endian window OR'd in with bitwise_or.at (handles byte overlap
    between adjacent tokens)."""
    fulllen = fulllen.astype(np.int64)
    offs = np.cumsum(fulllen) - fulllen
    total = int(offs[-1] + fulllen[-1]) if fulllen.size else 0
    out = np.zeros(-(-total // 8) + 8, dtype=np.uint8)
    if fulllen.size:
        shift = (offs & 7).astype(np.uint64)
        shifted = full.astype(np.uint64) << (
            np.uint64(64) - shift - fulllen.astype(np.uint64)
        )
        b8 = (
            shifted[:, None] >> (np.arange(56, -8, -8, dtype=np.uint64)[None, :])
        ).astype(np.uint8)
        np.bitwise_or.at(
            out, (offs >> 3)[:, None] + np.arange(8)[None, :], b8
        )
    return out[: -(-total // 8)].tobytes(), total


def encode_dct(pixels: np.ndarray, quality: int = 90, entropy: str = "huffman") -> bytes:
    """Lossy 'dct' encode: 8x8 DCT-II, quality-scaled quantization, then the
    entropy stage. entropy='huffman' (default, 'DCT2') is the real
    JPEG-baseline-style coder: zigzag, DC DPCM + AC (run, size) symbols
    with ZRL/EOB, per-payload canonical Huffman tables, packed extra bits.
    entropy='mask' keeps the legacy packbits-mask + int16 format ('DCT1')
    — both decode to BIT-IDENTICAL pixels (same quantized coefficients;
    parity + compression-ratio gates in tests/test_stateful_and_psnr.py)."""
    w, h, _ = pixels.shape
    blocks, pw, ph = _to_blocks(pixels)
    Qt = _quant_table(quality)
    coeffs = np.einsum("ij,njk,lk->nil", _D, blocks - 128.0, _D)
    q = np.round(coeffs / Qt).astype(np.int16)
    header = struct.pack("<HHHHB", w, h, pw, ph, int(quality))
    if entropy == "mask":
        flat = q.ravel()
        mask = flat != 0
        return (
            _DCT_MAGIC
            + header
            + np.packbits(mask).tobytes()
            + flat[mask].astype("<i2").tobytes()
        )
    if entropy != "huffman":
        raise ValueError(f"unknown entropy stage '{entropy}'")

    n = q.shape[0]
    z = q.reshape(n, 64)[:, _ZIGZAG].astype(np.int64)

    # --- DC: DPCM over the (channel-major, deterministic) block sequence
    dc = z[:, 0]
    diff = dc - np.concatenate([[0], dc[:-1]])
    dc_size = _bit_size(diff)
    dc_extra = np.where(diff >= 0, diff, diff + (1 << dc_size) - 1)

    # --- AC: (run, size) tokens with ZRL (0xF0) and EOB (0x00)
    za = z[:, 1:]
    nzb, nzp = np.nonzero(za)  # row-major: block asc, scan-pos asc
    apos = nzp + 1
    prev = np.concatenate([[0], apos[:-1]])
    first = np.concatenate([[True], nzb[1:] != nzb[:-1]]) if nzb.size else np.array([], bool)
    run = apos - np.where(first, 0, prev) - 1
    vals = za[nzb, nzp]
    ac_size = _bit_size(vals)
    n_zrl = run >> 4
    sym_ac = ((run & 15) << 4) | ac_size
    ac_extra = np.where(vals >= 0, vals, vals + (1 << ac_size) - 1)
    # EOB for every block whose last nonzero isn't scan position 63
    eob = np.ones(n, dtype=bool)
    if nzb.size:
        last = np.concatenate([nzb[1:] != nzb[:-1], [True]])
        eob[nzb[last][apos[last] == 63]] = False
    eob_blocks = np.nonzero(eob)[0]

    # assemble one global (block, scan-pos, sub) sorted token list
    zrl_src = np.repeat(np.arange(nzb.size), n_zrl)
    tok_sym = np.concatenate(
        [
            np.zeros(n, dtype=np.int64),  # DC placeholder (own table)
            np.full(zrl_src.size, 0xF0, dtype=np.int64),
            sym_ac,
            np.zeros(eob_blocks.size, dtype=np.int64),  # EOB = 0x00
        ]
    )
    tok_is_dc = np.concatenate(
        [
            np.ones(n, dtype=bool),
            np.zeros(zrl_src.size + nzb.size + eob_blocks.size, dtype=bool),
        ]
    )
    tok_extra = np.concatenate(
        [dc_extra, np.zeros(zrl_src.size, dtype=np.int64), ac_extra,
         np.zeros(eob_blocks.size, dtype=np.int64)]
    )
    tok_elen = np.concatenate(
        [dc_size, np.zeros(zrl_src.size, dtype=np.int64), ac_size,
         np.zeros(eob_blocks.size, dtype=np.int64)]
    )
    tok_sym[tok_is_dc] = dc_size  # DC symbol IS the size category
    key_block = np.concatenate(
        [np.arange(n), nzb[zrl_src], nzb, eob_blocks]
    )
    key_pos = np.concatenate(
        [np.zeros(n, dtype=np.int64), apos[zrl_src], apos,
         np.full(eob_blocks.size, 64, dtype=np.int64)]
    )
    # ZRLs precede their nonzero at the same scan position
    key_sub = np.concatenate(
        [
            np.zeros(n, dtype=np.int64),
            np.arange(zrl_src.size) - np.repeat(
                np.cumsum(n_zrl) - n_zrl, n_zrl
            ),
            n_zrl,
            np.zeros(eob_blocks.size, dtype=np.int64),
        ]
    )
    order = np.lexsort((key_sub, key_pos, key_block))
    tok_sym, tok_is_dc = tok_sym[order], tok_is_dc[order]
    tok_extra, tok_elen = tok_extra[order], tok_elen[order]

    # per-payload canonical Huffman tables
    dc_freq = np.bincount(tok_sym[tok_is_dc], minlength=256)
    ac_freq = np.bincount(tok_sym[~tok_is_dc], minlength=256)
    dc_lens, ac_lens = _huff_lengths(dc_freq), _huff_lengths(ac_freq)
    dc_codes, ac_codes = _canonical_codes(dc_lens), _canonical_codes(ac_lens)
    code = np.where(tok_is_dc, dc_codes[tok_sym], ac_codes[tok_sym])
    clen = np.where(tok_is_dc, dc_lens[tok_sym], ac_lens[tok_sym])
    stream, n_bits = _pack_bits(
        (code << tok_elen) | tok_extra, clen + tok_elen
    )
    return (
        _DCT2_MAGIC
        + header
        + _pack_table(dc_lens)
        + _pack_table(ac_lens)
        + struct.pack("<I", n_bits)
        + stream
    )


def _idct_blocks(z: np.ndarray, quality: int, w, h, pw, ph) -> np.ndarray:
    q = z.astype(np.float64).reshape(-1, 8, 8) * _quant_table(quality)
    blocks = np.einsum("ji,njk,kl->nil", _D, q, _D) + 128.0
    out = np.clip(np.round(blocks), 0, 255).astype(np.uint8)
    return _from_blocks(out, w, h, pw, ph)


def _decode_lut(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """16-bit prefix LUT: lut_sym[prefix16] / lut_len[prefix16]."""
    codes = _canonical_codes(lengths)
    lut_sym = np.zeros(1 << 16, dtype=np.int64)
    lut_len = np.zeros(1 << 16, dtype=np.int64)
    for s in np.nonzero(lengths)[0]:
        ln = int(lengths[s])
        lo = int(codes[s]) << (16 - ln)
        hi = lo + (1 << (16 - ln))
        lut_sym[lo:hi] = s
        lut_len[lo:hi] = ln
    return lut_sym, lut_len


def decode_dct(buf: bytes) -> np.ndarray:
    """Decode a 'DCT2' (huffman) or legacy 'DCT1' (packbits-mask) payload."""
    magic = buf[:4]
    w, h, pw, ph, quality = struct.unpack("<HHHHB", buf[4:13])
    n_coef = 3 * pw * ph
    if magic == _DCT_MAGIC:
        n_mask_bytes = -(-n_coef // 8)
        off = 13
        mask = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=n_mask_bytes, offset=off)
        )[:n_coef].astype(bool)
        vals = np.frombuffer(buf, dtype="<i2", offset=off + n_mask_bytes)
        flat = np.zeros(n_coef, dtype=np.int64)
        flat[mask] = vals
        return _idct_blocks(flat, quality, w, h, pw, ph)
    if magic != _DCT2_MAGIC:
        raise ValueError("not a DCT1/DCT2 payload")
    dc_lens, off = _unpack_table(buf, 13)
    ac_lens, off = _unpack_table(buf, off)
    (n_bits,) = struct.unpack_from("<I", buf, off)
    off += 4
    # Python-native buffers for the sequential token walk (round 7): the
    # loop is inherently serial (Huffman token boundaries are
    # data-dependent), but indexing a numpy array returns a numpy scalar at
    # ~100 ns per access — bytes/list indexing returns plain ints ~3x
    # faster. Bit-identical: pure container change.
    by = bytes(buf[off:]) + b"\x00\x00\x00\x00"
    dc_sym_a, dc_ln_a = _decode_lut(dc_lens)
    ac_sym_a, ac_ln_a = _decode_lut(ac_lens)
    dc_sym, dc_ln = dc_sym_a.tolist(), dc_ln_a.tolist()
    ac_sym, ac_ln = ac_sym_a.tolist(), ac_ln_a.tolist()

    def peek16(p: int) -> int:
        b = p >> 3
        return (
            ((by[b] << 16) | (by[b + 1] << 8) | by[b + 2]) >> (8 - (p & 7))
        ) & 0xFFFF

    n_blocks = n_coef // 64
    z = np.zeros((n_blocks, 64), dtype=np.int64)
    p = 0
    pred = 0
    for b in range(n_blocks):
        w16 = peek16(p)
        s = int(dc_sym[w16])
        p += int(dc_ln[w16])
        if s:
            e = peek16(p) >> (16 - s)
            p += s
            diff = e if e >= (1 << (s - 1)) else e - (1 << s) + 1
        else:
            diff = 0
        pred += diff
        z[b, 0] = pred
        k = 1
        while k < 64:
            w16 = peek16(p)
            sym = int(ac_sym[w16])
            p += int(ac_ln[w16])
            if sym == 0:  # EOB
                break
            run, s = sym >> 4, sym & 15
            if s == 0:  # ZRL
                k += 16
                continue
            k += run
            e = peek16(p) >> (16 - s)
            p += s
            z[b, k] = e if e >= (1 << (s - 1)) else e - (1 << s) + 1
            k += 1
    if p != n_bits:
        raise ValueError(f"DCT2 bitstream desync: consumed {p} of {n_bits} bits")
    flat = np.zeros((n_blocks, 64), dtype=np.int64)
    flat[:, _ZIGZAG] = z
    return _idct_blocks(flat.ravel(), quality, w, h, pw, ph)


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one payload to an (w, h, 3) uint8 array.

    'raw'  = C-order uint8 buffer (lossless, real).
    'qraw' = 2-bit-quantized raw (deterministic LOSSY stand-in: values are
             stored with the low 2 bits dropped; decode reconstructs the
             bucket midpoint). Max per-pixel error 2 -> PSNR >= 40 dB by
             construction, exercising the input_hint lossy gate.
    'dct'  = real block-DCT codec (encode_dct / decode_dct above).
    Other codecs are stubbed: the Spark plumbing around this call is
    complete; swap in a real codec (PIL/turbojpeg) on a cluster with one.
    """
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8).reshape(w, h, 3)
    if fmt == "qraw":
        q = np.frombuffer(buf, dtype=np.uint8).reshape(w, h, 3)
        return (q & 0xFC) | 0x02
    if fmt == "dct":
        return decode_dct(bytes(buf))
    raise NotImplementedError(
        f"image codec '{fmt}' is stubbed in this environment (no image libs); "
        "only fmt='raw'/'qraw'/'dct' decode"
    )


def encode_qraw(pixels: np.ndarray) -> bytes:
    """Lossy 'qraw' encode: drop the 2 low bits per channel."""
    return (pixels & 0xFC).astype(np.uint8).tobytes()


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images, dB."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image pixel stats via Arrow-batched decode — the canonical
    decode -> feature-extract plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [
                decode_image(b, w, h, f)
                for b, w, h, f in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "w": pdf["w"].astype("int32"),
                    "h": pdf["h"].astype("int32"),
                    "n_bytes": [len(b) for b in pdf["bytes"]],
                    "mean_px": [float(p.mean()) for p in px],
                    "min_px": [int(p.min()) for p in px],
                    "max_px": [int(p.max()) for p in px],
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, DECODE_STATS_SCHEMA
    )


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def image_embeddings(images: DataFrame, bins: int = 16) -> DataFrame:
    """Decode -> feature-extract: a deterministic per-channel histogram
    embedding (3 x `bins`, L2-normalized) per image — the feature-extraction
    plumbing that a learned encoder replaces on a real cluster. Identical
    pixels => identical embeddings, near-duplicate pixels => near-parallel
    embeddings, so the output column feeds the similarity/ANN/near-dup
    operators directly (exercised in tests + the image_embed_topk query).

    Arrow-batched mapInPandas; histogram is one numpy bincount per channel,
    no per-row Python UDFs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, w, h, f in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                px = decode_image(b, w, h, f)
                # bin index = px * bins // 256: correct for ANY bins (the
                # old shift-based index was only right for powers of two —
                # round-3 ADVICE); bit-identical to >>4 at the default 16
                idx = (px.astype(np.int64) * bins) >> 8
                vec = np.concatenate(
                    [
                        np.bincount(idx[:, :, c].ravel(), minlength=bins)[:bins]
                        for c in range(3)
                    ]
                ).astype(np.float64)
                n = np.linalg.norm(vec)
                out.append((vec / n if n > 0 else vec).tolist())
            yield pd.DataFrame({"image_id": pdf["image_id"], "embedding": out})

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, EMBED_SCHEMA
    )


def transcode(images: DataFrame, to_fmt: str = "dct", quality: int = 90) -> DataFrame:
    """Re-encode payloads into another codec (raw/qraw -> 'dct'): the
    ingest-compression step of an image pipeline, Arrow-batched. Output
    keeps the input_hint schema (bytes/w/h/fmt), so every downstream
    operator (decode_stats / image_embeddings / resize_nearest) runs on the
    compressed payloads unchanged."""
    if to_fmt not in ("dct", "qraw", "raw"):
        raise NotImplementedError(f"transcode target '{to_fmt}' not available here")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, w, h, f in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                px = decode_image(b, w, h, f)
                if to_fmt == "dct":
                    out.append(encode_dct(px, quality=quality))
                elif to_fmt == "qraw":
                    out.append(encode_qraw(px))
                else:
                    out.append(px.tobytes())
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "w": pdf["w"].astype("int32"),
                    "h": pdf["h"].astype("int32"),
                    "bytes": out,
                    "fmt": np.full(len(pdf), to_fmt, dtype=object),
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, RESIZE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_nearest(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw payloads (deterministic index-sample —
    the frame-sample/resize plumbing; real resample kernels plug in here)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, w, h, f in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                px = decode_image(b, w, h, f)
                ix = (np.arange(out_w) * w // out_w).astype(np.int64)
                iy = (np.arange(out_h) * h // out_h).astype(np.int64)
                out.append(px[np.ix_(ix, iy)].tobytes())
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "w": np.full(len(pdf), out_w, dtype="int32"),
                    "h": np.full(len(pdf), out_h, dtype="int32"),
                    "bytes": out,
                    "fmt": pdf["fmt"],
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, RESIZE_SCHEMA
    )


# ---------------------------------------------------------------------------
# audio modality — REAL decode + numpy-FFT feature extraction (no stubs:
# PCM16 decode is a frombuffer, spectra come from numpy's rfft)
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("band_energy", T.ArrayType(T.DoubleType())),
    ]
)


def decode_audio(buf: bytes, fmt: str) -> np.ndarray:
    """Decode one audio payload to float64 samples in [-1, 1).

    'pcm16' = little-endian mono int16 PCM (real). Compressed codecs
    (mp3/opus/flac) are stubbed at this seam — same pattern as the image
    decode seam; a soundfile/ffmpeg decoder plugs in on a cluster that
    ships one."""
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio codec '{fmt}' is stubbed in this environment; only 'pcm16' decodes"
    )


def audio_features(audio: DataFrame, n_bands: int = 16) -> DataFrame:
    """Per-clip acoustic features, Arrow-batched: duration, RMS level,
    spectral centroid (Hz), and an L2-normalized `n_bands`-band energy
    vector over linearly spaced rfft bins — the feature column that feeds
    the similarity/ANN/near-dup operators for the audio modality (the
    learned-encoder slot, like image_embeddings for images)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
            for b, sr, f in zip(pdf["bytes"], pdf["sample_rate"], pdf["fmt"]):
                x = decode_audio(b, f)
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(x.size, d=1.0 / sr)
                power = spec * spec
                tot = power.sum()
                centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
                # linear bands over [0, Nyquist]
                idx = np.minimum(
                    (freqs / (sr / 2.0) * n_bands).astype(np.int64), n_bands - 1
                )
                bands = np.bincount(idx, weights=power, minlength=n_bands)
                nb = np.linalg.norm(bands)
                rows["audio_id"].append(None)  # placeholder, set below
                rows["duration_sec"].append(float(x.size) / float(sr))
                rows["rms"].append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
                rows["spectral_centroid_hz"].append(centroid)
                rows["band_energy"].append(
                    (bands / nb if nb > 0 else bands).tolist()
                )
            rows["audio_id"] = list(pdf["audio_id"])
            yield pd.DataFrame(rows)

    return audio.select("audio_id", "bytes", "sample_rate", "fmt").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


def resample_audio(audio: DataFrame, target_rate: int) -> DataFrame:
    """Linear-interpolation resample to `target_rate` (real, numpy interp) —
    the audio analog of resize_nearest; output stays pcm16."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_b, out_n = [], []
            for b, sr, f in zip(pdf["bytes"], pdf["sample_rate"], pdf["fmt"]):
                x = decode_audio(b, f)
                n_out = max(1, int(round(x.size * target_rate / sr)))
                t_out = np.arange(n_out, dtype=np.float64) * (sr / target_rate)
                y = np.interp(t_out, np.arange(x.size, dtype=np.float64), x)
                out_b.append(
                    np.clip(np.round(y * 32768.0), -32768, 32767)
                    .astype("<i2")
                    .tobytes()
                )
                out_n.append(n_out)
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "bytes": out_b,
                    "sample_rate": np.full(len(pdf), target_rate, dtype="int32"),
                    "n_samples": np.array(out_n, dtype="int32"),
                    "fmt": pdf["fmt"],
                }
            )

    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
        ]
    )
    return audio.select(
        "audio_id", "bytes", "sample_rate", "n_samples", "fmt"
    ).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# video modality — frame decode / sampling / temporal stats (REAL for the
# raw-concatenated 'rawv' layout; container codecs stubbed at the same seam)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
    ]
)

VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("mean_motion", T.DoubleType()),
    ]
)


def decode_video(buf: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """Decode one payload to an (n_frames, w, h, 3) uint8 array. 'rawv' =
    n_frames C-order raw frames concatenated (real); container codecs
    (mp4/webm) are stubbed at this seam, same pattern as image/audio."""
    if fmt == "rawv":
        return np.frombuffer(buf, dtype=np.uint8).reshape(n_frames, w, h, 3)
    raise NotImplementedError(
        f"video codec '{fmt}' is stubbed in this environment; only 'rawv' decodes"
    )


def frame_sample(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame into IMAGE rows (image_id, bytes raw, w, h,
    fmt='raw' + video lineage columns) — the video -> image bridge: the
    sampled frames feed every image operator unchanged (decode_stats,
    image_embeddings, transcode-to-dct, resize)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in FRAME_SCHEMA.fields}
            for vid, b, w, h, nf, f in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fmt"],
            ):
                fr = decode_video(b, w, h, nf, f)
                for k in range(0, int(nf), every_k):
                    rows["image_id"].append(f"{vid}_f{k:04d}")
                    rows["bytes"].append(fr[k].tobytes())
                    rows["w"].append(int(w))
                    rows["h"].append(int(h))
                    rows["fmt"].append("raw")
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(k)
            yield pd.DataFrame(rows)

    return videos.select(
        "video_id", "bytes", "w", "h", "n_frames", "fmt"
    ).mapInPandas(kernel, FRAME_SCHEMA)


def video_stats(videos: DataFrame) -> DataFrame:
    """Per-clip temporal stats: duration, mean pixel level, and mean motion
    (mean absolute inter-frame pixel difference — a real temporal feature;
    0 for a static clip)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in VIDEO_STATS_SCHEMA.fields}
            for vid, b, w, h, nf, fps, f in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fps"], pdf["fmt"],
            ):
                fr = decode_video(b, w, h, nf, f).astype(np.float64)
                motion = (
                    float(np.mean(np.abs(np.diff(fr, axis=0)))) if nf > 1 else 0.0
                )
                rows["video_id"].append(vid)
                rows["n_frames"].append(int(nf))
                rows["duration_sec"].append(float(nf) / float(fps))
                rows["mean_px"].append(float(fr.mean()))
                rows["mean_motion"].append(motion)
            yield pd.DataFrame(rows)

    return videos.select(
        "video_id", "bytes", "w", "h", "n_frames", "fps", "fmt"
    ).mapInPandas(kernel, VIDEO_STATS_SCHEMA)
