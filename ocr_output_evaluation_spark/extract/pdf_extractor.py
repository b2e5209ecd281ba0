"""Minimal deterministic PDF text extraction (the PDF/layout branch).

Handles the subset of PDF that carries uncompressed text objects:
``BT ... ET`` blocks with ``(string) Tj`` / ``[(a) (b)] TJ`` show operators —
which is exactly what the deterministic fixture generator emits, and what
simple real-world text PDFs contain. Compressed streams (FlateDecode etc.)
are out of scope for the sandbox (no external libs) and yield an error row,
never a crash — failure isolation is per-row, like the reference's
per-volume try/except (/root/reference/parallel_processor.py:90-95).

Pure function of bytes: no libraries, no state.
"""

from __future__ import annotations

import re

# (string) literals inside a text block; PDF escapes: \( \) \\ \n \r \t
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

_ESCAPES = {
    b"\\n": b"\n",
    b"\\r": b"\r",
    b"\\t": b"\t",
    b"\\(": b"(",
    b"\\)": b")",
    b"\\\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        if raw[i : i + 1] == b"\\" and i + 1 < n:
            pair = raw[i : i + 2]
            if pair in _ESCAPES:
                out += _ESCAPES[pair]
                i += 2
                continue
            # Octal escape \ddd (1-3 OCTAL digits — bytes.isdigit() would
            # accept 8/9 and make int(digits, 8) raise on "\8")
            j = i + 1
            digits = b""
            while j < n and len(digits) < 3 and raw[j : j + 1] in b"01234567":
                digits += raw[j : j + 1]
                j += 1
            if digits:
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += raw[i + 1 : i + 2]
            i += 2
        else:
            out += raw[i : i + 1]
            i += 1
    return bytes(out)


def extract_pdf(pdf_bytes: bytes):  # -> ExtractionResult
    from .html_extractor import ExtractionResult

    if not pdf_bytes.rstrip().endswith(b"%%EOF"):
        return ExtractionResult(None, 0, 0, True, "pdf-truncated")
    blocks: list[str] = []
    dropped = 0
    for m in _BT_ET_RE.finditer(pdf_bytes):
        body = m.group(1)
        parts: list[bytes] = []
        for tj in _TJ_RE.finditer(body):
            parts.append(_unescape(tj.group(1)))
        for tja in _TJ_ARRAY_RE.finditer(body):
            for s in _STR_RE.finditer(tja.group(1)):
                parts.append(_unescape(s.group(1)))
        if not parts:
            dropped += 1
            continue
        try:
            text = b" ".join(parts).decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            dropped += 1
            continue
        text = " ".join(text.split())
        if text:
            blocks.append(text)
        else:
            dropped += 1
    if not blocks and dropped == 0:
        return ExtractionResult(None, 0, 0, True, "pdf-no-text")
    return ExtractionResult("\n".join(blocks), len(blocks), dropped, True, None)
