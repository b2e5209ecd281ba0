"""WARC source — reading Common-Crawl-style WARC/1.0 archives (ISO 28500)
into the ``web_pages`` frame, plus the deterministic encoder twin that
fixtures and round-trip tests use (the multimodal/mp4.py pattern: real
parser + real writer, no external libs).

Reference-repo analog: none — the reference reads per-volume parquet from
object storage (/root/reference/config.py:19-21); this is the rebuild's
ingestion path for its own domain, where the upstream artifact IS a WARC
crawl dump.

Format handled (the subset CC response archives use):
- records: header block (CRLF lines, ``Name: value``) terminated by a
  blank line, then exactly ``Content-Length`` payload bytes, then CRLF
  CRLF;
- ``WARC-Type: response`` payloads are full HTTP responses — status line
  + headers + CRLF CRLF + body; other record types (warcinfo, request,
  metadata) are counted and skipped;
- whole-file gzip (magic-sniffed). Per-member gzip (one stream per
  record, what the live CC corpus ships) decompresses with the same call
  because zlib consumes concatenated members sequentially via
  ``gzip.decompress``'s multi-member support.

Spark shape: ``spark.read.format("binaryFile")`` (one row per archive) →
``mapInPandas`` parse → one output row per response record. Per-FILE
Python, not per-row — the same boundary as the multimodal decoders; a
real crawl parallelizes across its thousands of ~1 GB archive files, one
task each (binaryFile's 2 GB-per-file ceiling matches the CC convention
of ~1 GB archives). Malformed archives fail IN-BAND: one row with NULL
url and the parse error in ``warc_error`` (the D3 channel), so a corrupt
file never kills the job.
"""

from __future__ import annotations

import gzip
import hashlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd

__all__ = ["encode_warc", "parse_warc", "read_warc", "read_warc_stream"]

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Encoder twin (fixtures) — deterministic: record ids derive from the url.
# ---------------------------------------------------------------------------
def encode_warc(records: list[dict], compress: bool = False) -> bytes:
    """records: [{url, warc_ts (datetime), html (bytes), status (int,
    default 200)}] -> WARC/1.0 bytes (one warcinfo record, then one
    response record per input)."""
    out = bytearray()

    def rec(headers: list[tuple[str, str]], payload: bytes) -> None:
        out.extend(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.extend(f"{k}: {v}".encode() + _CRLF)
        out.extend(f"Content-Length: {len(payload)}".encode() + _CRLF)
        out.extend(_CRLF)
        out.extend(payload)
        out.extend(_CRLF + _CRLF)

    info = b"software: ocr-output-evaluation-spark fixtures\r\n"
    rec(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        info,
    )
    for r in records:
        body = r["html"] or b""
        status = int(r.get("status", 200))
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rid = hashlib.md5(r["url"].encode()).hexdigest()
        ts = r["warc_ts"]
        rec(
            [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}>"),
                ("WARC-Date", ts.strftime("%Y-%m-%dT%H:%M:%SZ")),
                ("WARC-Target-URI", r["url"]),
                ("Content-Type", "application/http;msgtype=response"),
            ],
            http,
        )
    raw = bytes(out)
    return gzip.compress(raw, mtime=0) if compress else raw


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------
def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line: {line[:60]!r}")
        headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
            "utf-8", "replace"
        ).strip()
    return headers


def parse_warc(b: bytes) -> list[dict]:
    """WARC bytes -> one dict per RESPONSE record: {url, warc_ts
    (datetime|None), status (int|None), html (bytes)}; other record types
    are skipped. Raises ValueError on structural corruption (bad magic,
    missing/invalid Content-Length, truncated payload)."""
    if b[:2] == b"\x1f\x8b":
        b = gzip.decompress(b)
    pos, n = 0, len(b)
    out: list[dict] = []
    while pos < n:
        # tolerate inter-record padding CRLFs
        while b[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not b.startswith(b"WARC/", pos):
            raise ValueError(f"bad record magic at offset {pos}")
        hdr_end = b.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated record header")
        first_nl = b.find(_CRLF, pos)
        headers = _parse_headers(b[first_nl + 2 : hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/invalid Content-Length") from e
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("truncated record payload")
        payload = b[body_start : body_start + clen]
        pos = body_start + clen
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(_CRLF + _CRLF)
        status: int | None = None
        body = payload
        if http_end >= 0 and payload[:5] == b"HTTP/":
            status_line = payload.split(_CRLF, 1)[0].split(b" ")
            if len(status_line) >= 2 and status_line[1].isdigit():
                status = int(status_line[1])
            body = payload[http_end + 4 :]
        ts = None
        if "warc-date" in headers:
            try:
                ts = datetime.strptime(
                    headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc)
            except ValueError:
                ts = None
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_ts": ts,
                "status": status,
                "html": body,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------
READ_WARC_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, html binary, "
    "warc_file string, warc_error string"
)


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _records_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["url", "warc_ts", "http_status", "html", "warc_file", "warc_error"]
    for pdf in batches:
        rows = []
        for fpath, content in zip(pdf["path"], pdf["content"]):
            try:
                for r in parse_warc(bytes(content)):
                    rows.append(
                        (
                            r["url"],
                            r["warc_ts"].replace(tzinfo=None) if r["warc_ts"] else None,
                            r["status"],
                            r["html"],
                            fpath,
                            None,
                        )
                    )
            except ValueError as e:
                rows.append((None, None, None, None, fpath, str(e)))
        yield pd.DataFrame(rows, columns=cols)


def read_warc(spark, path: str):
    """-> DataFrame(url, warc_ts, http_status, html, warc_file,
    warc_error): every response record of every WARC archive under
    ``path`` (*.warc / *.warc.gz). One parse task per archive; a corrupt
    archive yields ONE in-band error row (NULL url, warc_error set)
    instead of failing the job. Feed ``select(url, warc_ts, html)`` plus
    a NULL text/lang into the extraction pipeline for the full
    crawl-to-text path (byte-identity pytest-pinned)."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(_records_gen, READ_WARC_SCHEMA)


def read_warc_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """Streaming twin of ``read_warc``: new archives landing under ``path``
    become micro-batches (binaryFile file-stream source; explicit schema —
    streaming sources cannot infer), each parsed by the same per-file
    generator. ``max_files_per_trigger`` bounds archives per micro-batch
    (a ~1 GB-archive feed wants small batches). Point it at the live crawl
    directory and chain the extraction UDF for continuous crawl-to-text
    with checkpoint resume (streaming/pipeline.py stream_warc_extraction)."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(_records_gen, READ_WARC_SCHEMA)
