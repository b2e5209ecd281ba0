"""X76 perceptual image hashing + Hamming-banded near-dup
(multimodal/phash.py): golden bit-exactness, the invariances the hash
exists for (brightness shift, grid resize), discrimination on unrelated
images, end-to-end hashing over the media fixtures, banding recall
(exact vs a python brute force, the pigeonhole-boundary pair), and the
report composition."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.multimodal import (
    media_df,
    phash64_py,
    phash_images,
    phash_near_dup_pairs,
    resize_images,
)

GOLDEN_GRADIENT = -9066507922647124613


def _gradient():
    g = np.zeros((48, 64, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:48, 0:64]
    g[:, :, 0] = (xx * 4) % 256
    g[:, :, 1] = (yy * 5) % 256
    g[:, :, 2] = ((xx + yy) * 3) % 256
    return g


def _rnd(seed: str, shape):
    n = int(np.prod(shape))
    out, k = b"", 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{k}".encode()).digest()
        k += 1
    return np.frombuffer(out[:n], dtype=np.uint8).reshape(shape)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_golden_and_invariances():
    g = _gradient()
    h = phash64_py(g)
    assert h == GOLDEN_GRADIENT  # bit-exact, reproducible across runs
    # constant brightness shift moves only the DC neighbourhood: <= 3 bits
    g2 = np.clip(g.astype(np.int64) + 10, 0, 255).astype(np.uint8)
    assert _ham(h, phash64_py(g2)) <= 3
    # nearest-grid downsample by an integer factor is hash-IDENTICAL
    big = _rnd("big", (128, 128, 3))
    ys = np.arange(64) * 128 // 64
    assert phash64_py(big) == phash64_py(big[np.ix_(ys, ys)])
    # grayscale + 2-channel inputs hash without error
    assert isinstance(phash64_py(_rnd("gray", (30, 30))), int)
    assert isinstance(phash64_py(_rnd("ga", (30, 30, 2))), int)


def test_discrimination():
    a, b = _rnd("a", (40, 40, 3)), _rnd("b", (40, 40, 3))
    assert _ham(phash64_py(a), phash64_py(b)) >= 16


def test_phash_images_over_fixtures(spark):
    m = media_df(spark, 60, partitions=2)
    sig = phash_images(m).collect()
    kinds = {r.kind for r in sig}
    hashed = [r for r in sig if r.phash is not None]
    erred = [r for r in sig if r.phash is None]
    assert hashed and erred and len(sig) == 60
    assert all(r.kind == "image" for r in hashed)
    assert all(r.error is not None for r in erred)
    assert "audio" in kinds and "video" in kinds
    # resize twins are hash-identical (the report's invariance claim)
    twins = resize_images(m, 32, 32).join(
        m.select("media_id", "kind"), "media_id"
    )
    tw = {r.media_id: r.phash for r in phash_images(twins).collect()
          if r.phash is not None}
    orig = {r.media_id: r.phash for r in hashed}
    assert tw and all(tw[i] == orig[i] for i in tw)


def test_banding_recall_exact(spark):
    """Candidates from the 8x8-bit bands must equal a python brute force
    for max_hamming <= 7 — including a pair at EXACTLY Hamming 7 (the
    pigeonhole boundary)."""
    hs = [
        int.from_bytes(
            hashlib.sha256(f"ph:{i}".encode()).digest()[:8],
            "big",
            signed=True,
        )
        for i in range(18)
    ]
    # plant: dup of h0, a 7-bit flip of h1 (bits spread over 7 bands)
    hs.append(hs[0])
    flip = hs[1]
    for b in range(7):
        flip ^= 1 << (8 * b)
    hs.append(flip)
    rows = [(i, h) for i, h in enumerate(hs)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dup_pairs(df, max_hamming=7).collect()
    }
    want = {
        (i, j, _ham(hs[i], hs[j]))
        for i in range(len(hs))
        for j in range(i + 1, len(hs))
        if _ham(hs[i], hs[j]) <= 7
    }
    assert got == want
    assert (0, 18, 0) in got and (1, 19, 7) in got
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dup_pairs(df, max_hamming=64)


def test_report_composition(spark):
    from ocr_output_evaluation_spark.queries import phash_dedup_report

    rows = phash_dedup_report(spark, "/root/testdata/sf0.001").collect()
    assert [r.kind for r in rows] == ["image"]
    r = rows[0]
    # every hashed image finds its resize twin at Hamming 0
    assert r.n_hashed > 0 and r.n_twin_exact == r.n_hashed
    assert r.n_pairs >= r.n_twin_exact


def test_plan_pins(spark):
    from tests.test_plans import plan_of

    m = media_df(spark, 20, partitions=2)
    plan = plan_of(phash_near_dup_pairs(phash_images(m)))
    # hashing is the Arrow channel (allowed: multimodal/); the band join
    # and the bit_count verify stay JVM-side
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
