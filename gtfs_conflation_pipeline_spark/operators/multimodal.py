"""Multimodal (image/audio/video) column operators.

Payloads are opaque `binary` columns with typed metadata beside them (the
input_hint schema: bytes/w/h/fmt). The Spark-side plumbing — schemas,
Arrow batch shapes, partitioning — is real and tested; the actual
image-codec decode is STUBBED (no PIL/ffmpeg in this container): 'raw' format
decodes for real (numpy frombuffer), any other format raises
NotImplementedError at the decode site, clearly marked.

All operators are mapInPandas over Arrow batches — bytes never pass through
per-row Python UDFs.
"""

from __future__ import annotations

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


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one payload to an (w, h, 3) uint8 array.

    'raw'  = C-order uint8 buffer (lossless, real).
    'qraw' = 2-bit-quantized raw (deterministic LOSSY stand-in: values are
             stored with the low 2 bits dropped; decode reconstructs the
             bucket midpoint). Max per-pixel error 2 -> PSNR >= 40 dB by
             construction, exercising the input_hint lossy gate.
    Other codecs are stubbed: the Spark plumbing around this call is
    complete; swap in a real codec (PIL/turbojpeg) on a cluster with one.
    """
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8).reshape(w, h, 3)
    if fmt == "qraw":
        q = np.frombuffer(buf, dtype=np.uint8).reshape(w, h, 3)
        return (q & 0xFC) | 0x02
    raise NotImplementedError(
        f"image codec '{fmt}' is stubbed in this environment (no image libs); "
        "only fmt='raw'/'qraw' decode"
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
