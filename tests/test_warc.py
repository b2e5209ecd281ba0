"""WARC source (sources/warc.py): encoder/parser round-trip, gzip
handling, record-type skipping, in-band corrupt-archive errors, and
byte-identity of the crawl -> extraction path."""

from datetime import datetime

from ocr_output_evaluation_spark.extract import extract_document
from ocr_output_evaluation_spark.fixtures.generate import web_pages_pdf
from ocr_output_evaluation_spark.sources.warc import (
    encode_warc,
    parse_warc,
    read_warc,
)


def _records(n, offset=0):
    pdf = web_pages_pdf(n + offset).iloc[offset:]
    return [
        {
            "url": row.url,
            "warc_ts": row.warc_ts or datetime(2024, 5, 1, 12, 0, 0),
            "html": bytes(row.html) if row.html is not None else b"",
        }
        for _, row in pdf.iterrows()
    ]


def test_warc_roundtrip_plain_and_gzip():
    recs = _records(6)
    for compress in (False, True):
        raw = encode_warc(recs, compress=compress)
        got = parse_warc(raw)
        assert len(got) == 6  # warcinfo skipped
        for want, r in zip(recs, got):
            assert r["url"] == want["url"]
            assert r["html"] == want["html"]
            assert r["status"] == 200
            assert r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == want[
                "warc_ts"
            ].strftime("%Y-%m-%dT%H:%M:%SZ")


def test_warc_parse_rejects_corruption():
    import pytest

    raw = encode_warc(_records(2))
    with pytest.raises(ValueError, match="magic"):
        parse_warc(b"NOTWARC" + raw)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(raw[: len(raw) - 40])


def test_read_warc_spark_and_extraction_byte_identity(spark, tmp_path):
    """Two archives (one gzipped) + one corrupt file: read_warc yields
    every response record exactly once, one in-band error row for the
    corrupt archive, and the extraction UDF over the WARC frame is
    byte-identical to the single-process extractor."""
    import os

    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.extract.udf import extract_udf

    recs = _records(10)
    src = tmp_path / "crawl"
    os.makedirs(src)
    (src / "a.warc").write_bytes(encode_warc(recs[:5]))
    (src / "b.warc.gz").write_bytes(encode_warc(recs[5:], compress=True))
    (src / "c.warc").write_bytes(b"WARC/1.0\r\nbroken")

    df = read_warc(spark, str(src))
    rows = df.collect()
    ok = [r for r in rows if r.warc_error is None]
    bad = [r for r in rows if r.warc_error is not None]
    assert len(ok) == 10 and len(bad) == 1
    assert bad[0].url is None and bad[0].warc_file.endswith("c.warc")
    got = {r.url: bytes(r.html) for r in ok}
    assert got == {r["url"]: r["html"] for r in recs}
    assert all(r.http_status == 200 for r in ok)

    ext = (
        df.filter(F.col("warc_error").isNull())
        .withColumn("x", extract_udf(F.col("html")))
        .select("url", "x.text_sha256")
    )
    want = {r["url"]: extract_document(r["html"]).text_sha256 for r in recs}
    assert {r.url: r.text_sha256 for r in ext.collect()} == want


def test_run_extraction_from_warc_source(spark, tmp_path):
    """The crawl-to-text path as one resumable job: run_extraction over a
    directory of WARC archives (source_format='warc') produces the same
    byte-identical extractions as the parquet path, with manifest resume
    (second invocation processes zero buckets)."""
    import os

    from ocr_output_evaluation_spark.plans.pipeline import run_extraction

    recs = _records(12)
    src = tmp_path / "crawl"
    os.makedirs(src)
    (src / "a.warc").write_bytes(encode_warc(recs[:6]))
    (src / "b.warc.gz").write_bytes(encode_warc(recs[6:], compress=True))
    out, man = str(tmp_path / "out"), str(tmp_path / "man")

    res = run_extraction(
        spark, str(src), out, man, n_buckets=4, source_format="warc"
    )
    assert res["row_count"] == 12 and len(res["processed_buckets"]) == 4
    got = {r.url: r.text_sha256 for r in spark.read.parquet(out).collect()}
    want = {r["url"]: extract_document(r["html"]).text_sha256 for r in recs}
    assert got == want

    res2 = run_extraction(
        spark, str(src), out, man, n_buckets=4, source_format="warc"
    )
    assert res2["processed_buckets"] == [] and len(res2["skipped_buckets"]) == 4


def test_stream_warc_extraction_resume(spark, tmp_path):
    """Continuous crawl-to-text: archives arriving across micro-batches
    stream through the parser + extraction UDF byte-identically; a second
    archive landing AFTER the first run is picked up by the resumed query
    without re-reading the first (checkpoint offsets at the archive
    level)."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from ocr_output_evaluation_spark.streaming import stream_warc_extraction

    recs = _records(8)
    src = tmp_path / "crawl"
    os.makedirs(src)
    (src / "a.warc").write_bytes(encode_warc(recs[:4]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = stream_warc_extraction(spark, str(src), out, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    got1 = {r.url: r.text_sha256 for r in spark.read.parquet(out).collect()}
    want = {r["url"]: extract_document(r["html"]).text_sha256 for r in recs}
    assert got1 == {u: want[u] for u in got1} and len(got1) == 4

    # a new archive lands; the resumed query processes ONLY it
    (src / "b.warc.gz").write_bytes(encode_warc(recs[4:], compress=True))
    q2 = stream_warc_extraction(spark, str(src), out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert {r.url: r.text_sha256 for r in rows} == want and len(rows) == 8
    resumed_in = sum(int(p["numInputRows"]) for p in q2.recentProgress)
    assert resumed_in == 1  # one archive row read, not five
