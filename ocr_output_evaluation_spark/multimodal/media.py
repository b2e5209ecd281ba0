"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The training-data-pipeline extension of the engine (no analog in the
reference, which is text/confidence only): media payloads ride through the
same web_pages-style tables as `binary` columns, and every per-payload
compute step is an Arrow-batched pandas UDF / mapInPandas — identical
plumbing to the HTML extraction stage (extract/udf.py), so the same scale
properties hold (column pruning before the UDF, bounded Arrow batches,
in-band error rows).

Real codecs (PIL / soundfile / cv2) are NOT in this container, so decoding
is split in two:

- a deterministic FAKE container format (``FIMG``/``FAUD``/``FVID`` headers
  + raw payload, produced by the seeded fixture generator below). Parsing it
  is REAL code — header validation, shape math, raster/frame slicing — and
  everything downstream (features, resize, frame sampling) operates on the
  decoded bytes for real.
- ``_decode_real(...)`` — the branch a production build would take for
  JPEG/PNG/WAV/MP4 bytes; it raises NotImplementedError behind a try-import
  so the pipeline shape is honest about the stub.

Layouts (big-endian):
  FIMG: magic(4) | width u16 | height u16 | channels u8 | raster w*h*c bytes
  FAUD: magic(4) | sample_rate u32 | n_samples u32 | samples (u8 each)
  FVID: magic(4) | width u16 | height u16 | n_frames u16 | frames (w*h bytes each)
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MAGIC_IMG, MAGIC_AUD, MAGIC_VID = b"FIMG", b"FAUD", b"FVID"

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.DoubleType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

MEDIA_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Pure decode (single source of truth; used by UDFs and by tests' golden path)
# ---------------------------------------------------------------------------
def _decode_real(payload: bytes) -> dict:
    """Production branch for real codecs — stubbed: the container has no
    image/audio libraries. Gated behind try-imports so a deployment that
    ships Pillow/soundfile gets the real path without code changes."""
    try:  # pragma: no cover - not installed here
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real media codecs (Pillow/soundfile/cv2) are not available in "
            "this environment; only the FIMG/FAUD/FVID fixture containers "
            "are decodable"
        )
    raise NotImplementedError("real-codec decode not implemented")


def decode_meta(payload: bytes | None) -> dict:
    """Parse the typed header out of a payload. Never raises on bad input —
    errors are returned in-band (the D3 failure-isolation rule of the
    extraction pipeline, /root/reference/parallel_processor.py:90-95 analog)."""
    out = dict(
        format=None, width=None, height=None, n_channels=None, sample_rate=None,
        n_samples=None, n_frames=None, payload_bytes=None, error=None,
    )
    if payload is None:
        out["error"] = "null-payload"
        return out
    b = bytes(payload)
    out["payload_bytes"] = len(b)
    if len(b) < 4:
        out["error"] = "truncated-header"
        return out
    magic = b[:4]
    try:
        if magic == MAGIC_IMG:
            if len(b) < 9:
                out["error"] = "truncated-header"
                return out
            w, h = struct.unpack(">HH", b[4:8])
            c = b[8]
            out.update(format="fimg", width=w, height=h, n_channels=c)
            if len(b) - 9 != w * h * c:
                out["error"] = "raster-size-mismatch"
        elif magic == MAGIC_AUD:
            if len(b) < 12:
                out["error"] = "truncated-header"
                return out
            sr, n = struct.unpack(">II", b[4:12])
            out.update(format="faud", sample_rate=sr, n_samples=n)
            if len(b) - 12 != n:
                out["error"] = "sample-count-mismatch"
        elif magic == MAGIC_VID:
            if len(b) < 10:
                out["error"] = "truncated-header"
                return out
            w, h, nf = struct.unpack(">HHH", b[4:10])
            out.update(format="fvid", width=w, height=h, n_frames=nf)
            if len(b) - 10 != w * h * nf:
                out["error"] = "frame-size-mismatch"
        else:
            _decode_real(b)
    except NotImplementedError as e:
        out["error"] = f"unsupported-codec: {e.args[0][:60]}"
    return out


def _raster(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    w, h = struct.unpack(">HH", payload[4:8])
    c = payload[8]
    arr = np.frombuffer(payload[9:], dtype=np.uint8).reshape(h, w, c)
    return arr, w, h, c


# ---------------------------------------------------------------------------
# Seeded fixture generation (deterministic, no external data)
# ---------------------------------------------------------------------------
_SEED = "ooe-media-v1"


def _hbytes(i: int, tag: str, n: int) -> bytes:
    out = b""
    k = 0
    while len(out) < n:
        out += hashlib.sha256(f"{_SEED}:{i}:{tag}:{k}".encode()).digest()
        k += 1
    return out[:n]


def make_media_row(i: int) -> dict:
    kind = ("image", "image", "audio", "video", "image")[i % 5]
    lang = ("en", "de", "fr", "zh", "bo")[i % 5]
    if i % 23 == 0:
        return {"media_id": i, "kind": kind, "payload": None, "lang": lang}
    if i % 29 == 0:
        return {"media_id": i, "kind": kind, "payload": b"\x89PNG-ish" + _hbytes(i, "junk", 32), "lang": lang}
    if kind == "image":
        w, h, c = 8 + i % 24, 8 + (i * 7) % 24, 1 + (i % 3)
        payload = MAGIC_IMG + struct.pack(">HH", w, h) + bytes([c]) + _hbytes(i, "px", w * h * c)
    elif kind == "audio":
        sr, n = 8000 * (1 + i % 3), 64 + (i * 13) % 256
        payload = MAGIC_AUD + struct.pack(">II", sr, n) + _hbytes(i, "pcm", n)
    else:
        w, h, nf = 8 + i % 8, 8 + i % 8, 2 + i % 6
        payload = MAGIC_VID + struct.pack(">HHH", w, h, nf) + _hbytes(i, "fr", w * h * nf)
    return {"media_id": i, "kind": kind, "payload": payload, "lang": lang}


def media_df(spark, n: int, partitions: int = 8) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [make_media_row(int(i)) for i in pdf["id"]],
                columns=["media_id", "kind", "payload", "lang"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------
@F.pandas_udf(MEDIA_META)
def decode_meta_udf(payload: pd.Series) -> pd.DataFrame:
    """payload BINARY -> typed meta struct (scalar Arrow-batched UDF)."""
    rows = [decode_meta(p if p is None else bytes(p)) for p in payload]
    return pd.DataFrame(rows, columns=[f.name for f in MEDIA_META.fields])


def image_features(df: DataFrame, payload_col: str = "payload", n_bins: int = 16) -> DataFrame:
    """Byte-level features per payload (mean/std + n_bins histogram of the
    DECODED body — raster/PCM/frames, header excluded) via mapInPandas.

    The feature math is numpy over the whole Arrow batch; only (media_id,
    kind, payload) cross the channel — select before calling at scale."""
    edges = np.linspace(0, 256, n_bins + 1)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                meta = decode_meta(p if p is None else bytes(p))
                if meta["error"] is not None:
                    rows.append((int(mid), kind, None, None, None, meta["error"]))
                    continue
                body = bytes(p)[{"fimg": 9, "faud": 12, "fvid": 10}[meta["format"]]:]
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.histogram(arr, bins=edges)[0]
                rows.append(
                    (
                        int(mid),
                        kind,
                        float(arr.mean()),
                        float(arr.std(ddof=0)),
                        (hist / max(arr.size, 1)).astype("float64").tolist(),
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "byte_mean", "byte_std", "histogram", "error"]
            )

    return df.select("media_id", "kind", payload_col).mapInPandas(run, schema=MEDIA_FEATURES)


def resize_images(df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload") -> DataFrame:
    """Nearest-neighbour resize of FIMG rasters to (out_w, out_h); non-image
    or undecodable rows pass through with the error in-band. Deterministic:
    index math only, no interpolation kernels."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                meta = decode_meta(p if p is None else bytes(p))
                if meta["error"] is not None or meta["format"] != "fimg":
                    rows.append((int(mid), None, None, None, meta["error"] or "not-an-image"))
                    continue
                arr, w, h, c = _raster(bytes(p))
                ys = (np.arange(out_h) * h // out_h).astype(np.int64)
                xs = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = arr[np.ix_(ys, xs)]
                payload = (
                    MAGIC_IMG + struct.pack(">HH", out_w, out_h) + bytes([c]) + resized.tobytes()
                )
                rows.append((int(mid), payload, out_w, out_h, None))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "width", "height", "error"])

    return df.select("media_id", payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_k: int = 2, payload_col: str = "payload") -> DataFrame:
    """Frame sampling for FVID payloads: emit every k-th frame as its own row
    (mapInPandas with row expansion — the UDTF-shaped member of the family).
    Non-video rows produce no output rows."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                meta = decode_meta(p if p is None else bytes(p))
                if meta["error"] is not None or meta["format"] != "fvid":
                    continue
                b = bytes(p)
                w, h, nf = meta["width"], meta["height"], meta["n_frames"]
                fsize = w * h
                for idx in range(0, nf, every_k):
                    frame = b[10 + idx * fsize : 10 + (idx + 1) * fsize]
                    rows.append((int(mid), idx, frame, w, h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame", "width", "height"])

    return df.select("media_id", payload_col).mapInPandas(run, schema=MEDIA_FRAMES)
