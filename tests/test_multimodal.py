"""Multimodal column plumbing: decode / features / resize / frame-sample.

The fake FIMG/FAUD/FVID containers make the Spark-side plumbing (schemas,
Arrow batches, row expansion, in-band errors) fully testable without image
libraries; each operator is checked against a pure-Python/numpy golden twin.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.multimodal import (
    decode_meta_udf,
    image_features,
    make_media_row,
    media_df,
    resize_images,
    sample_frames,
)
from ocr_output_evaluation_spark.multimodal.media import _raster, decode_meta

N = 120


@pytest.fixture(scope="module")
def media(spark):
    return media_df(spark, N, partitions=4).persist()


def test_decode_meta_matches_pure_and_flags_errors(spark, media):
    got = {
        r.media_id: r.asDict()
        for r in media.select("media_id", decode_meta_udf(F.col("payload")).alias("m"))
        .select("media_id", "m.*")
        .collect()
    }
    assert len(got) == N
    for i in range(N):
        want = decode_meta(make_media_row(i)["payload"])
        have = {k: got[i][k] for k in want}
        assert have == want, f"media {i}"
    # error classes present: null payload, unknown codec (stubbed real branch)
    errs = {v["error"] for v in got.values()}
    assert "null-payload" in errs
    assert any(e and e.startswith("unsupported-codec") for e in errs)


def test_image_features_golden(spark, media):
    feats = {r.media_id: r for r in image_features(media).collect()}
    assert len(feats) == N
    checked = 0
    for i in range(N):
        row = make_media_row(i)
        meta = decode_meta(row["payload"])
        f = feats[i]
        if meta["error"] is not None:
            assert f.error is not None
            continue
        body = row["payload"][{"fimg": 9, "faud": 12, "fvid": 10}[meta["format"]]:]
        arr = np.frombuffer(body, dtype=np.uint8)
        assert f.byte_mean == pytest.approx(float(arr.mean()))
        assert f.byte_std == pytest.approx(float(arr.std(ddof=0)))
        assert len(f.histogram) == 16
        assert sum(f.histogram) == pytest.approx(1.0)
        checked += 1
    assert checked > N // 2


def test_resize_images_golden(spark, media):
    out = {r.media_id: r for r in resize_images(media, 4, 6).collect()}
    checked = 0
    for i in range(N):
        row = make_media_row(i)
        meta = decode_meta(row["payload"])
        r = out[i]
        if meta["error"] is not None or meta["format"] != "fimg":
            assert r.error is not None and r.payload is None
            continue
        arr, w, h, c = _raster(row["payload"])
        ys = (np.arange(6) * h // 6).astype(np.int64)
        xs = (np.arange(4) * w // 4).astype(np.int64)
        want = arr[np.ix_(ys, xs)].tobytes()
        assert bytes(r.payload)[9:] == want
        assert (r.width, r.height) == (4, 6)
        m2 = decode_meta(bytes(r.payload))
        assert m2["error"] is None and (m2["width"], m2["height"]) == (4, 6)
        checked += 1
    assert checked > 10


def test_sample_frames_every_other(spark, media):
    frames = sample_frames(media, every_k=2).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    checked = 0
    for i in range(N):
        row = make_media_row(i)
        meta = decode_meta(row["payload"])
        if meta["error"] is not None or meta["format"] != "fvid":
            assert i not in by_media
            continue
        got = sorted(by_media[i], key=lambda r: r.frame_idx)
        want_idx = list(range(0, meta["n_frames"], 2))
        assert [r.frame_idx for r in got] == want_idx
        fsize = meta["width"] * meta["height"]
        for r in got:
            start = 10 + r.frame_idx * fsize
            assert bytes(r.frame) == row["payload"][start : start + fsize]
        checked += 1
    assert checked > 5
