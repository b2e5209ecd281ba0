"""X76 — perceptual image hashing (pHash) and Hamming-banded image
near-dup: the DCT-based 64-bit perceptual hash (Zauner 2010,
"Implementation and benchmarking of perceptual image hash functions";
the pHash.org algorithm) used by the published web-scale image dedup
pipelines (e.g. LAION's CLIP+pHash dedup): grayscale -> 32x32 downsample
-> 2D DCT-II -> the 8x8 low-frequency block -> one bit per coefficient
against the block median. Near-duplicate retrieval is the SimHash
banding trick on the 64-bit code: 8 exact-match bands of 8 bits, so any
pair within Hamming distance 7 shares at least one band by pigeonhole —
candidates come from equi-joins, never an all-pairs scan.

Deterministic variant: the downsample is the engine's nearest-neighbour
index grid (multimodal/media.py resize_images) rather than a smoothing
kernel, and the median excludes the DC term — pinned by golden tests, so
hashes are reproducible bit-for-bit across runs and cluster sizes.

Spark-first shape, and how it holds at 100 TB:
- hashing is mapInPandas over the Arrow batch (per-row Python is allowed
  in multimodal/ — CLAUDE.md; the DCT itself is two 32x32 numpy matmuls
  per image, vectorizable per batch); only (media_id, kind, payload)
  cross the channel.
- near-dup candidates: the hash frame explodes to 8 fixed-width band
  rows, buckets on (band, value) — the X2/X3 banded-dedup shape: pair
  work is bounded by bucket sizes, the verify is one codegen
  bit_count(xor) expression, and the corpus of PAYLOADS never shuffles
  (only 8 x 16-byte rows per image do).
Reference analog: none — rebuild-only operator (SURVEY §2.13).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .media import _decode, _raster

__all__ = ["phash64_py", "phash_images", "phash_near_dup_pairs"]


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (float64)."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT32 = _dct_matrix(32)


def phash64_py(arr: np.ndarray) -> int:
    """64-bit pHash of an (h, w) or (h, w, c) uint8 raster as a SIGNED
    64-bit int (two's complement — Spark LongType). Grayscale via the
    ITU-R 601 luma weights when >= 3 channels; nearest-neighbour 32x32
    grid; bit i (row-major over the 8x8 DCT block, bit 0 = MSB) is set
    iff the coefficient exceeds the median of the 63 non-DC block
    coefficients."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            g = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        else:
            g = a[:, :, 0]
    else:
        g = a
    h, w = g.shape
    ys = np.arange(32, dtype=np.int64) * h // 32
    xs = np.arange(32, dtype=np.int64) * w // 32
    small = g[np.ix_(ys, xs)]
    block = (_DCT32 @ small @ _DCT32.T)[:8, :8]
    flat = block.reshape(-1)
    med = float(np.median(flat[1:]))
    v = 0
    for i in range(64):
        if flat[i] > med:
            v |= 1 << (63 - i)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def phash_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """-> (media_id, kind, phash, error): pHash per image payload (FIMG
    containers and real PNGs/JPEGs); non-image or undecodable rows carry
    the error in-band and a NULL hash (the D3 failure-isolation rule)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf[payload_col]
            ):
                meta, body = _decode(p if p is None else bytes(p))
                if meta["error"] is not None or meta["format"] not in (
                    "fimg",
                    "png",
                    "jpeg",
                ):
                    rows.append(
                        (int(mid), kind, None, meta["error"] or "not-an-image")
                    )
                    continue
                if meta["format"] in ("png", "jpeg"):
                    arr = body  # decoded once in _decode
                else:
                    arr, _w, _h, _c = _raster(bytes(p))
                rows.append((int(mid), kind, phash64_py(arr), None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "phash", "error"]
            )

    return df.select("media_id", "kind", payload_col).mapInPandas(
        run, schema=_PHASH_SCHEMA
    )


def phash_near_dup_pairs(
    sigs: DataFrame,
    max_hamming: int = 7,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """-> (id_a, id_b, hamming): all pairs with Hamming(phash) <=
    ``max_hamming`` (id_a < id_b). Candidates come from 8 exact-match
    8-bit bands (any pair differing in <= 7 bits shares an intact band
    by pigeonhole, so recall is EXACT for max_hamming <= 7; a larger
    threshold keeps the same candidate set and the docstring contract
    shifts to best-effort). The verify is one codegen
    bit_count(a XOR b) expression; NULL hashes are dropped.
    ``max_hamming`` must be 0..63."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be 0..63, got {max_hamming}")
    base = sigs.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    ).filter(F.col("_h").isNotNull())
    # 8 bands of 8 bits; shiftright needs int literals (CLAUDE.md) —
    # unrolled in Python
    bands = base.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("_h"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("v"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_h", "_band.b", "_band.v")
    right = bands.select(
        F.col("b"),
        F.col("v"),
        F.col("_id").alias("_id2"),
        F.col("_h").alias("_h2"),
    )
    cand = (
        bands.join(right, ["b", "v"])
        .filter(F.col("_id") < F.col("_id2"))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id2").alias("id_b"),
            F.col("_h").alias("_ha"),
            F.col("_h2").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
