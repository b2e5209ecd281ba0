"""Multimodal column plumbing: decode / features / resize / frame-sample.

The fake FIMG/FAUD/FVID containers stress the Spark-side plumbing (schemas,
Arrow batches, row expansion, in-band errors); the REAL stdlib codecs (PNG
chunk/inflate/unfilter decoder, WAV via `wave`) are exercised both through
the fixture rows that carry genuine PNG/WAV bytes and by direct round-trip
tests below. Each operator is checked against a pure-Python/numpy golden
twin."""

from __future__ import annotations

import struct
import zlib

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
from ocr_output_evaluation_spark.multimodal.media import (
    PNG_SIG,
    _raster,
    decode_body,
    decode_meta,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

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
        arr = decode_body(row["payload"], meta)
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
        if meta["error"] is not None or meta["format"] not in ("fimg", "png", "jpeg"):
            assert r.error is not None and r.payload is None
            continue
        if meta["format"] == "png":
            _, arr = decode_png(row["payload"])
            h, w, c = arr.shape
        elif meta["format"] == "jpeg":
            from ocr_output_evaluation_spark.multimodal.jpeg import decode_jpeg as _dj

            _, arr = _dj(bytes(row["payload"]))
            h, w, c = arr.shape
        else:
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
    from ocr_output_evaluation_spark.multimodal.mp4 import decode_mp4

    frames = sample_frames(media, every_k=2).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    checked = checked_mp4 = 0
    for i in range(N):
        row = make_media_row(i)
        meta = decode_meta(row["payload"])
        if meta["error"] is not None or meta["format"] not in ("fvid", "mp4"):
            assert i not in by_media
            continue
        got = sorted(by_media[i], key=lambda r: r.frame_idx)
        want_idx = list(range(0, meta["n_frames"], 2))
        assert [r.frame_idx for r in got] == want_idx
        if meta["format"] == "mp4":
            body = decode_mp4(row["payload"])[1]
            for r in got:
                assert bytes(r.frame) == body[r.frame_idx].tobytes()
            checked_mp4 += 1
        else:
            fsize = meta["width"] * meta["height"]
            for r in got:
                start = 10 + r.frame_idx * fsize
                assert bytes(r.frame) == row["payload"][start : start + fsize]
            checked += 1
    assert checked > 5 and checked_mp4 > 5


# ---------------------------------------------------------------------------
# Real codecs (VERDICT r1 item 9)
# ---------------------------------------------------------------------------
def _filter_scanlines(arr: np.ndarray, filters: list[int]) -> bytes:
    """Reference PNG filterer for the test only: produce the FILTERED raw
    stream for a chosen per-row filter type, so decode_png's unfilter paths
    1-4 are exercised against ground truth (our encoder always emits 0)."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int16)
    out = b""
    prev = np.zeros(stride, dtype=np.int16)
    for y, ft in zip(range(h), filters):
        line = flat[y]
        a = np.concatenate([np.zeros(c, np.int16), line[:-c]])
        b = prev
        cdiag = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - a
        elif ft == 2:
            enc = line - b
        elif ft == 3:
            enc = line - ((a + b) >> 1)
        elif ft == 4:
            p = a + b - cdiag
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cdiag)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cdiag))
            enc = line - pred
        out += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line
    return out


def test_png_roundtrip_and_all_filters():
    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(6, 5, c), dtype=np.uint8)
        meta, back = decode_png(encode_png(arr))
        assert (meta["width"], meta["height"], meta["n_channels"]) == (5, 6, c)
        assert np.array_equal(back, arr)

    # hand-build a PNG using every filter type 0-4 and check exact decode
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    raw = _filter_scanlines(arr, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    meta, back = decode_png(png)
    assert np.array_equal(back, arr)


def test_png_malformed_stays_in_band():
    good = encode_png(np.zeros((3, 3, 1), dtype=np.uint8))
    truncated = good[: len(good) // 2]
    meta = decode_meta(truncated)
    assert meta["error"] is not None and meta["error"].startswith("decode-error")
    # interlaced / 16-bit variants are rejected, not mis-decoded
    bad_ihdr = struct.pack(">IIBBBBB", 3, 3, 16, 0, 0, 0, 0)
    assert "unsupported png" in str(pytest.raises(ValueError, decode_png, PNG_SIG
        + good[8:16] + bad_ihdr + good[16 + 13:]).value)


def test_wav_roundtrip():
    pcm = bytes(range(200)) + bytes(56)
    b = encode_wav(pcm, 16000)
    meta, body = decode_wav(b)
    assert meta == {"format": "wav", "sample_rate": 16000, "n_samples": 256, "n_channels": 1}
    assert body.tobytes() == pcm
    top = decode_meta(b)
    assert top["error"] is None and top["format"] == "wav"
    assert top["sample_rate"] == 16000 and top["n_samples"] == 256


def test_fixture_contains_real_codecs_and_features_cover_them(spark, media):
    metas = [decode_meta(make_media_row(i)["payload"]) for i in range(N)]
    fmts = {m["format"] for m in metas if m["error"] is None}
    assert {"png", "jpeg", "wav", "fimg", "faud", "fvid", "mp4"} <= fmts
    # the Spark feature pass scores real-codec rows, not just containers
    feats = {r.media_id: r for r in image_features(media).collect()}
    png_ids = [i for i, m in enumerate(metas) if m["format"] == "png" and m["error"] is None]
    jpg_ids = [i for i, m in enumerate(metas) if m["format"] == "jpeg" and m["error"] is None]
    wav_ids = [i for i, m in enumerate(metas) if m["format"] == "wav" and m["error"] is None]
    assert png_ids and jpg_ids and wav_ids
    for i in png_ids + jpg_ids + wav_ids:
        assert feats[i].error is None and feats[i].byte_mean is not None


def test_png_decompression_bomb_rejected():
    """A crafted IDAT inflating far past the declared raster must surface as
    an in-band error, not an allocation blow-up (review r2)."""
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)  # declares 3x3 gray

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
        )

    bomb = _z.compress(bytes(50_000_000))  # inflates to 50 MB against 12 B declared
    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    meta = decode_meta(png)
    assert meta["error"] is not None and "decode-error" in meta["error"]
    # absurd declared dimensions are rejected before any inflation
    big_ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    png2 = PNG_SIG + chunk(b"IHDR", big_ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    meta2 = decode_meta(png2)
    assert meta2["error"] is not None and "too large" in meta2["error"]


def test_ivf_build_ignores_null_vectors(spark, tmp_path):
    """NULL/empty vectors must neither crash centroid sampling nor land in a
    NULL-cell partition (review r2)."""
    from ocr_output_evaluation_spark.operators.ann_index import (
        build_ivf_index,
        ivf_top_k_indexed,
    )

    rows = [(i, [float(i), 1.0]) for i in range(12)] + [(90, None), (91, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_null")
    build_ivf_index(spark, df, "embedding", "vec_id", path, n_cells=4, seed=1)
    idx = spark.read.parquet(f"{path}/index")
    assert idx.count() == 12  # null/empty rows excluded entirely
    got = ivf_top_k_indexed(spark, path, [1.0, 1.0], k=3, n_probe=4)
    assert len(got.collect()) == 3


# ---------------------------------------------------------------------------
# Codec fuzz (hypothesis): decode_meta is total; round-trips are exact
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_meta_total_on_arbitrary_bytes(payload):
    """Any byte string — truncated headers, fake magics, garbage chunk
    lengths — must come back as an in-band meta dict, never an exception."""
    meta = decode_meta(payload)
    assert set(meta) == {
        "format", "width", "height", "n_channels", "sample_rate",
        "n_samples", "n_frames", "payload_bytes", "error",
    }


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_meta_total_on_corrupted_png(payload):
    """PNG-signature-prefixed garbage exercises the chunk walker / inflate /
    unfilter error paths; all must stay in-band."""
    meta = decode_meta(PNG_SIG + payload)
    assert meta["error"] is None or isinstance(meta["error"], str)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_fuzz(w, h, c, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    meta, back = decode_png(encode_png(arr))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (w, h, c)
    assert np.array_equal(back, arr)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=600), st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_fuzz(pcm, sr):
    meta, body = decode_wav(encode_wav(pcm, sr))
    assert meta["sample_rate"] == sr and meta["n_samples"] == len(pcm)
    assert body.tobytes() == pcm


def test_png_many_idat_chunks_linear_and_capped():
    """ADVICE r2: IDAT is list-collected + joined once (O(n), not O(n²) bytes
    concat), so a many-chunk stream decodes fine up to the chunk-count cap
    and is rejected in-band past it."""
    import zlib as _z

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    one = encode_png(arr)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
        )

    # re-chunk the single IDAT into 1-byte chunks (legal per spec)
    (ilen,) = struct.unpack(">I", one[16 + 13 + 4 : 16 + 13 + 8])
    ihdr = one[16 : 16 + 13]
    idat = one[16 + 13 + 4 + 8 : 16 + 13 + 4 + 8 + ilen]
    rechunked = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + b"".join(chunk(b"IDAT", idat[i : i + 1]) for i in range(len(idat)))
        + chunk(b"IEND", b"")
    )
    meta, back = decode_png(rechunked)
    assert np.array_equal(back, arr)

    # past the cap: rejected in-band, never a CPU-amplification loop
    flood = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat[:1]) * 70_000
        + chunk(b"IEND", b"")
    )
    m = decode_meta(flood)
    assert m["error"] is not None and "too many chunks" in m["error"]


def test_write_table_any_rejects_missing_bucket_col(spark, tmp_path):
    """ADVICE r2: a typo'd bucket column must fail loudly in the parquet
    branch (the Iceberg branch would fail at analysis) instead of silently
    writing an unpartitioned table."""
    from ocr_output_evaluation_spark.sources.iceberg import write_table_any

    df = spark.range(5).selectExpr("cast(id as string) AS url", "id AS v")
    with pytest.raises(ValueError, match="bucket_col 'ur1'"):
        write_table_any(spark, df, str(tmp_path / "t"), bucket_col="ur1")


# ---------------------------------------------------------------------------
# JPEG codec (multimodal/jpeg.py — VERDICT r2 item 5)
# ---------------------------------------------------------------------------
from ocr_output_evaluation_spark.multimodal.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


def _smooth(h, w, c, seed=5):
    """JPEG-friendly fixture: low-frequency gradient + mild noise."""
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    base = np.stack([(xx * 0.5 + yy * 0.5)] * c, axis=-1)
    return np.clip(base + rng.normal(0, 4, size=(h, w, c)), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_tolerance_all_layouts():
    """Lossy round-trip pin: gray + RGB, 4:4:4 + 4:2:0, odd (non-block)
    dimensions. The DCT quantization at quality 90 bounds per-pixel error
    far under visible levels; the assert bounds are ~2x the measured worst
    case so a codec regression (wrong zigzag, bad dequant, swapped chroma)
    fails loudly while float rounding noise never does."""
    for h, w, c in [(24, 31, 3), (16, 16, 1), (9, 13, 3), (8, 8, 3)]:
        arr = _smooth(h, w, c)
        for sub in (False, True):
            b = encode_jpeg(arr, quality=90, subsample=sub)
            meta, back = decode_jpeg(b)
            assert (meta["width"], meta["height"], meta["n_channels"]) == (w, h, c)
            d = np.abs(back.astype(int) - arr.astype(int))
            assert d.max() <= 40 and d.mean() <= 8.0, (h, w, c, sub, d.max(), d.mean())


def test_jpeg_solid_color_decodes_near_exact():
    """A solid block is pure DC — quantization barely touches it, so decode
    must land within ±2 of the source everywhere (catches DC-predictor and
    level-shift bugs exactly)."""
    for color in ((128, 128, 128), (200, 40, 90)):
        arr = np.tile(np.array(color, dtype=np.uint8), (17, 19, 1))
        meta, back = decode_jpeg(encode_jpeg(arr, quality=95))
        assert np.abs(back.astype(int) - arr.astype(int)).max() <= 2
    gray = np.full((12, 12, 1), 77, dtype=np.uint8)
    _, back = decode_jpeg(encode_jpeg(gray, quality=95))
    assert np.abs(back.astype(int) - 77).max() <= 2


def test_jpeg_rejects_progressive_and_malformed_in_band():
    good = encode_jpeg(_smooth(10, 10, 3))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be rejected
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert "decode-error" in decode_meta(prog)["error"]
    # truncation inside entropy data stays in-band
    assert decode_meta(good[: len(good) - 10])["error"] is not None
    # decode_meta integration: a good jpeg yields typed meta
    m = decode_meta(good)
    assert m["error"] is None and m["format"] == "jpeg" and (m["width"], m["height"]) == (10, 10)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_meta_total_on_corrupted_jpeg(payload):
    """SOI-prefixed garbage exercises the marker walker / huffman / scan
    error paths; all must stay in-band (D3)."""
    meta = decode_meta(b"\xff\xd8\xff" + payload)
    assert meta["error"] is None or isinstance(meta["error"], str)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_roundtrip_fuzz(w, h, c, sub, seed):
    """Every (size, channels, sampling) combination decodes to the declared
    shape with bounded error — including 1xN strips and sub-block images."""
    arr = _smooth(h, w, c, seed=seed)
    meta, back = decode_jpeg(encode_jpeg(arr, quality=92, subsample=sub))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (w, h, c)
    assert back.shape == (h, w, c)
    d = np.abs(back.astype(int) - arr.astype(int))
    assert d.mean() <= 10.0


# ---------------------------------------------------------------------------
# MP4 container codec (multimodal/mp4.py — closes the last X14 codec stub)
# ---------------------------------------------------------------------------
from ocr_output_evaluation_spark.multimodal.mp4 import (  # noqa: E402
    decode_mp4,
    encode_mp4,
    parse_mp4,
)


def _frames(nf, h, w, seed=11):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (nf, h, w), dtype=np.uint8)


def test_mp4_roundtrip_byte_exact_all_chunkings():
    """Uncompressed (raw/depth-40) samples must survive encode->parse->decode
    byte-exactly under every chunk layout — single-chunk, per-frame chunks,
    multi-entry stsc with a short tail, and a chunk_size past the frame
    count. This pins the whole stsz/stsc/stco resolution path."""
    fr = _frames(7, 14, 9)
    for cs in (None, 1, 2, 3, 7, 50):
        b = encode_mp4(fr, chunk_size=cs)
        meta, body = decode_mp4(b)
        assert meta["error"] is None and meta["format"] == "mp4"
        assert (meta["width"], meta["height"], meta["n_frames"]) == (9, 14, 7)
        assert (body == fr).all(), cs
    # single-frame file
    _, one = decode_mp4(encode_mp4(fr[:1]))
    assert (one == fr[:1]).all()


def test_mp4_container_meta_and_timescale():
    fr = _frames(4, 8, 8)
    info = parse_mp4(encode_mp4(fr, timescale=9000, sample_delta=300, chunk_size=2))
    assert info["codec"] == "raw " and info["depth"] == 40
    assert info["timescale"] == 9000 and info["duration"] == 4 * 300
    assert info["n_samples"] == 4 and len(info["samples"]) == 4
    # sample table: 2 chunks of 2, contiguous within each chunk
    (o0, s0), (o1, _), (o2, _), _ = info["samples"]
    assert s0 == 64 and o1 == o0 + 64 and o2 == o0 + 128


def test_mp4_compressed_codec_refused_in_band_with_meta_intact():
    """An avc1 track parses to full container metadata (the training-pipeline
    index) but pixel decode is refused in-band — same boundary contract as
    progressive JPEG."""
    b = encode_mp4(_frames(3, 8, 8), chunk_size=1)
    patched = b.replace(b"raw ", b"avc1")
    assert patched != b
    meta, body = decode_mp4(patched)
    assert body is None and "unsupported-codec" in meta["error"]
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 8, 3)
    # through the media layer: typed meta row, error in-band, nothing raises
    m = decode_meta(patched)
    assert m["format"] == "mp4" and "avc1" in m["error"]


def test_mp4_box_bombs_capped():
    """CPU-amplification guards: a payload of thousands of 8-byte boxes and a
    deeply-nested container chain must both fail fast in-band (the PNG-IDAT
    / JPEG-bit-reader guard class)."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    bomb = ftyp + (struct.pack(">I", 8) + b"free") * 10_000
    with pytest.raises(ValueError, match="too many boxes"):
        parse_mp4(bomb)
    nest = b""
    for _ in range(12):
        nest = struct.pack(">I", 8 + len(nest)) + b"moov" + nest
    with pytest.raises(ValueError, match="nesting too deep"):
        parse_mp4(ftyp + nest)
    # both stay in-band through the media layer
    assert decode_meta(bomb)["error"] is not None
    assert decode_meta(ftyp + nest)["error"] is not None


def test_mp4_malformed_structures_in_band():
    good = encode_mp4(_frames(4, 10, 6), chunk_size=2)
    # truncations at every interesting boundary
    for cut in (5, 12, 40, len(good) // 2, len(good) - 4):
        assert decode_meta(good[:cut])["error"] is not None, cut
    # a sample that extends past the payload end (stco patched to huge)
    idx = good.rindex(b"stco")
    patched = bytearray(good)
    patched[idx + 12 : idx + 16] = struct.pack(">I", len(good) - 1)
    assert decode_meta(bytes(patched))["error"] is not None
    # declared box size larger than the buffer
    patched = bytearray(good)
    patched[0:4] = struct.pack(">I", len(good) + 100)
    assert decode_meta(bytes(patched))["error"] is not None


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_meta_total_on_corrupted_mp4(payload):
    """ftyp-prefixed garbage exercises the box walker / sample-table error
    paths; all must stay in-band (D3)."""
    meta = decode_meta(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4 + payload)
    assert meta["error"] is None or isinstance(meta["error"], str)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=11),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_mp4_roundtrip_fuzz(w, h, nf, cs, seed):
    fr = _frames(nf, h, w, seed=seed)
    meta, body = decode_mp4(encode_mp4(fr, chunk_size=cs))
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, nf)
    assert (body == fr).all()


def _audio_first(b: bytes, break_video_stco: bool = False) -> bytes:
    """Box surgery: splice a minimal 'soun' trak (with junk-but-wellformed
    sample tables) BEFORE the video trak inside moov; optionally neuter the
    video trak's stco (fourcc -> 'free') to simulate an incomplete video
    track following a complete audio track."""
    from ocr_output_evaluation_spark.multimodal.mp4 import _box, _fullbox

    pos, boxes = 0, []
    while pos < len(b):
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        boxes.append((b[pos + 4 : pos + 8], pos, size))
        pos += size
    mtyp, mpos, msize = boxes[-1]
    assert mtyp == b"moov"
    payload = b[mpos + 8 : mpos + msize]
    s0 = struct.unpack(">I", payload[:4])[0]
    mvhd, vtrak = payload[:s0], payload[s0:]
    if break_video_stco:
        i = vtrak.index(b"stco")
        vtrak = vtrak[:i] + b"free" + vtrak[i + 4 :]
    stbl = _box(
        b"stbl",
        _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"mp4a", b"\x00" * 28))
        + _fullbox(b"stts", 0, 0, struct.pack(">III", 1, 2, 1024))
        + _fullbox(b"stsz", 0, 0, struct.pack(">III", 0, 2, 4) + struct.pack(">I", 4))
        + _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 2, 1))
        + _fullbox(b"stco", 0, 0, struct.pack(">III", 2, 40, 48)),
    )
    hdlr = _fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"a\x00")
    mdhd = _fullbox(
        b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 44100, 2048) + struct.pack(">Hh", 0x55C4, 0)
    )
    atrak = _box(b"trak", _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))
    return b[:mpos] + _box(b"moov", mvhd + atrak + vtrak)


def test_mp4_audio_track_before_video_track():
    """Multi-track ordering: a complete non-video track preceding the video
    track must neither pollute the video track's metadata (timescale/codec
    come from the VIDEO mdhd/stsd) nor be silently borrowed by an incomplete
    video track (which must stay an in-band error, not a wrong decode)."""
    fr = _frames(5, 12, 7)
    good = _audio_first(encode_mp4(fr, timescale=1000, chunk_size=2))
    info = parse_mp4(good)
    assert info["codec"] == "raw " and info["timescale"] == 1000
    meta, body = decode_mp4(good)
    assert meta["error"] is None and (body == fr).all()
    # incomplete video trak after a complete audio trak: error, not borrow
    broken = _audio_first(encode_mp4(fr, chunk_size=2), break_video_stco=True)
    with pytest.raises(ValueError, match="complete sample table"):
        parse_mp4(broken)
    assert decode_meta(broken)["error"] is not None
