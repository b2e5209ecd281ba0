"""Minimal baseline JPEG codec — stdlib + numpy only, correctness-grade.

VERDICT r2 item 5 resolved the "JPEG question" on X14 by vendoring a real
decoder, like the PNG one (media.py): Pillow/cv2 are genuinely absent from
this container, so the only honest way for the multimodal pipeline to carry
real JPEG bytes is to decode them itself. Everything here is public-spec
knowledge (ISO/IEC 10918-1 / ITU-T T.81; quantization + Huffman tables from
Annex K, JFIF colorspace from the JFIF 1.02 note).

Scope (a *correctness* decoder, not a fast one — media payloads are decoded
inside Arrow-batched executors where the per-image Python cost is the same
story as the extraction UDF):

- decode: baseline sequential DCT (SOF0) only; 8-bit samples; 1- or
  3-component; arbitrary sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0);
  restart markers honored; progressive (SOF2) and arithmetic coding are
  rejected with ValueError — callers keep errors in-band (media.py D3).
- encode: 4:4:4 (no subsampling), quality-scaled Annex-K quant tables,
  Annex-K Huffman tables, grayscale or RGB. Lossy by nature — the
  round-trip contract is tolerance-based (unlike PNG's exactness), pinned
  in tests/test_multimodal.py.

The float IDCT is an exact orthonormal matrix product (numpy), so decoded
pixels are deterministic for fixed bytes — the property the byte-identity
test strategy needs — even though JPEG itself only promises approximate
reconstruction.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants from the public spec -----------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_C = None


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: D = C @ block @ C.T, block = C.T @ D @ C."""
    global _C
    if _C is None:
        x = np.arange(8)
        u = x[:, None]
        m = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2 / 8)
        m[0, :] = np.sqrt(1 / 8)
        _C = m
    return _C


def _build_codes(bits: list[int], values: list[int]) -> dict[int, int]:
    """Canonical Huffman assignment (spec C.2): {value: (length<<16)|code}."""
    out: dict[int, int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length << 16) | code
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): value} — the decode-side twin of _build_codes."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --- decoder -----------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with FF00 byte-unstuffing; stops at any
    real marker (FFxx, xx not in {00, D0-D7})."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise ValueError("marker inside entropy data")
        else:
            self.pos += 1
        # Mask to the live window: without this, acc grows one Python-bigint
        # byte per scan byte and every shift becomes O(scan) — quadratic
        # total, a CPU-amplification hole on large untrusted payloads (the
        # same class as the PNG IDAT O(n^2) concat fixed in r2).
        self.acc = (((self.acc << 8) | b) & 0xFFFF)
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_restart(self, expected: int) -> None:
        """Byte-align, then consume the FFD0+i marker (called between
        restart intervals)."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        if (self.data[self.pos + 1] - 0xD0) != expected:
            raise ValueError("restart marker out of sequence")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(b: bytes) -> tuple[dict, np.ndarray]:
    """Baseline JPEG -> (meta fields, raster (h, w, c) uint8). Raises
    ValueError on non-baseline/malformed input — callers (media.py _decode)
    keep errors in-band. The wrapper normalizes the internal failure modes
    a truncated/garbled entropy stream can hit (IndexError past the buffer
    end, struct.error on short segments, an unexpected RSTn with no DRI)
    to the documented ValueError contract."""
    try:
        return _decode_jpeg_inner(b)
    except ValueError:
        raise
    except (_RestartMarker, IndexError, struct.error) as e:
        raise ValueError(f"malformed jpeg ({type(e).__name__})") from e


def _decode_jpeg_inner(b: bytes) -> tuple[dict, np.ndarray]:
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError("not a jpeg")
    if len(b) > 64 * 1024 * 1024:
        raise ValueError("jpeg payload too large")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = b[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        seg = b[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0x0F, tq=tq))
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                raise ValueError("sampling factors beyond 2 unsupported")
            if w == 0 or h == 0 or w * h * nc > 64 * 1024 * 1024:
                raise ValueError("declared raster too large or empty")
            sof = dict(w=w, h=h, comps=comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                scan_sel[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                b, pos + 2 + seglen, sof, qt, huff, scan_sel, restart_interval
            )
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_scan(b, pos, sof, qt, huff, scan_sel, restart_interval):
    w, h, comps = sof["w"], sof["h"], sof["comps"]
    if sorted(scan_sel) != sorted(c["id"] for c in comps):
        raise ValueError("scan/frame component mismatch")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    C = _dct_matrix()
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
        dc_t, ac_t = scan_sel[c["id"]]
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise ValueError("missing huffman table")
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    rst_seq = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_and_consume_restart(rst_seq % 8)
                rst_seq += 1
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                dtab, atab = huff[(0, dc_t)], huff[(1, ac_t)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _decode_huff(br, dtab)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, atab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coef * q
                        px = C.T @ blk.reshape(8, 8) @ C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        arr = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    else:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        arr = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
    meta = dict(
        format="jpeg", width=int(w), height=int(h), n_channels=int(len(comps))
    )
    return meta, arr


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_blocks(bw, blocks, q, dc_codes, ac_codes, pred: int) -> int:
    C = _dct_matrix()
    for blk in blocks:
        coef = C @ (blk - 128.0) @ C.T
        zz = np.round(coef.reshape(-1)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
        s, bits = _magnitude(int(zz[0]) - pred)
        pred = int(zz[0])
        c = dc_codes[s]
        bw.write(c & 0xFFFF, c >> 16)
        if s:
            bw.write(bits, s)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    c = ac_codes[0x00]  # EOB
                    bw.write(c & 0xFFFF, c >> 16)
                    break
                run += 1
                continue
            while run > 15:
                c = ac_codes[0xF0]  # ZRL
                bw.write(c & 0xFFFF, c >> 16)
                run -= 16
            s, bits = _magnitude(v)
            c = ac_codes[(run << 4) | s]
            bw.write(c & 0xFFFF, c >> 16)
            bw.write(bits, s)
            run = 0
    return pred


def encode_jpeg(arr: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """(h, w, 1|3) uint8 -> baseline JFIF bytes (Annex-K tables
    quality-scaled). ``subsample=True`` emits 4:2:0 (2x2 luma sampling,
    2x2-mean chroma) — primarily so the decoder's upsampling path has a
    real in-repo producer; default is 4:4:4. The fixture generator's source
    of genuine JPEG bytes; round-trips through decode_jpeg within the lossy
    tolerance pinned in tests."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("expect (h, w, 1|3) uint8")
    h, w, nc = arr.shape
    f = arr.astype(np.float64)
    if nc == 3:
        r, g, bl = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        chans = [y, cb, cr]
    else:
        chans = [f[..., 0]]
    sub = bool(subsample) and nc == 3
    luma_hv = 0x22 if sub else 0x11
    qts = [_scale_qt(QT_LUMA, quality), _scale_qt(QT_CHROMA, quality)]
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    n_qt = 2 if nc == 3 else 1
    for tq in range(n_qt):
        zz = qts[tq][ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, luma_hv if ci == 0 else 0x11, 0 if ci == 0 else 1])
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if nc == 3:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tclass])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])
    dc_l, ac_l = _build_codes(*HT_DC_LUMA), _build_codes(*HT_AC_LUMA)
    dc_c, ac_c = _build_codes(*HT_DC_CHROMA), _build_codes(*HT_AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * nc
    if sub:
        # 4:2:0 MCU = 16x16 px: 4 luma blocks + 1 Cb + 1 Cr (2x2-mean)
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        yp = np.pad(chans[0], ((0, ph - h), (0, pw - w)), mode="edge")
        half = [
            np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            .reshape(ph // 2, 2, pw // 2, 2)
            .mean(axis=(1, 3))
            for c in chans[1:]
        ]
        for my in range(ph // 16):
            for mx in range(pw // 16):
                blocks = [
                    yp[my * 16 + by * 8 : my * 16 + by * 8 + 8,
                       mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
                    for by in range(2) for bx in range(2)
                ]
                preds[0] = _encode_blocks(bw, blocks, qts[0], dc_l, ac_l, preds[0])
                for ci, hp in enumerate(half, start=1):
                    blk = hp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[ci] = _encode_blocks(bw, [blk], qts[1], dc_c, ac_c, preds[ci])
    else:
        # 4:4:4: pad to 8x8 blocks by edge replication, interleaved 1x1 MCUs
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = [np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in chans]
        for my in range(ph // 8):
            for mx in range(pw // 8):
                for ci in range(nc):
                    blk = padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    q = qts[0 if ci == 0 else 1]
                    dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    preds[ci] = _encode_blocks(bw, [blk], q, dc, ac, preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
