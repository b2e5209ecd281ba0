"""North-rule invariant: Spark-distributed extraction is byte-identical per url
to the single-process pure-Python extractor (SURVEY.md §5.2(1))."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.extract import extract_document, extract_html, extract_pdf
from ocr_output_evaluation_spark.extract.udf import domain_of, with_extraction
from ocr_output_evaluation_spark.fixtures.generate import (
    make_html,
    make_pdf,
    web_pages_df,
    web_pages_pdf,
)

N_FIXTURE = 500


def golden(pdf):
    """Single-process golden: {url: (sha256, error)} from the pure extractor."""
    out = {}
    for _, row in pdf.iterrows():
        r = extract_document(row.html)
        out[row.url] = (r.text_sha256, r.error)
    return out


class TestPureExtractor:
    def test_main_content_kept_boilerplate_dropped(self):
        html = make_html(7, "en")
        r = extract_document(html)
        assert r.error is None and not r.is_pdf
        # No boilerplate vocabulary leaks into extracted text.
        for w in ["home", "about", "login", "subscribe", "copyright"]:
            assert w not in (r.text or "").split()
        assert r.n_blocks_kept >= 1

    def test_link_density_drop(self):
        html = b"<html><body><p>" + b'<a href="/">word word word word word word</a> tail' + b"</p></body></html>"
        r = extract_html(html)
        assert r.n_blocks_kept == 0 and r.n_blocks_dropped == 1

    def test_text_density_keep(self):
        body = ("word " * 20).strip()
        r = extract_html(f"<html><body><p>{body}</p></body></html>".encode())
        assert r.text == body and r.n_blocks_kept == 1

    def test_pdf_branch(self):
        r = extract_document(make_pdf(3, "en"))
        assert r.is_pdf and r.error is None and len(r.text) > 0

    def test_pdf_escapes(self):
        pdf = b"%PDF-1.4\nBT (a \\(b\\) c) Tj ET\n%%EOF"
        r = extract_pdf(pdf)
        assert r.text == "a (b) c"

    def test_error_rows_never_raise(self):
        assert extract_document(b"").error == "empty-input"
        assert extract_document(None).error == "empty-input"
        assert extract_document(b"%PDF-1.4\nBT (x) Tj ET").error == "pdf-truncated"
        assert extract_document(b"<p>\xff\x80\x80 broken</p>").error == "decode-error"

    def test_determinism(self):
        h = make_html(42, "de")
        a, b = extract_document(h), extract_document(h)
        assert a.text == b.text and a.text_sha256 == b.text_sha256


@pytest.mark.usefixtures("spark")
class TestSparkParity:
    def test_byte_identical_extraction(self, spark):
        pdf = web_pages_pdf(N_FIXTURE)
        want = golden(pdf)

        df = web_pages_df(spark, N_FIXTURE, partitions=8)
        got_rows = (
            with_extraction(df)
            .select("url", "extraction.text_sha256", "extraction.error")
            .collect()
        )
        assert len(got_rows) == N_FIXTURE
        mismatches = [
            r.url for r in got_rows if want[r.url] != (r.text_sha256, r.error)
        ]
        assert mismatches == []

    def test_distributed_generation_matches_single_process(self, spark):
        pdf = web_pages_pdf(100)
        rows = web_pages_df(spark, 100, partitions=5).collect()
        by_url = {r.url: r for r in rows}
        for _, row in pdf.iterrows():
            got = by_url[row.url]
            assert bytes(got.html or b"") == bytes(row.html or b"")
            assert got.lang == row.lang

    def test_error_isolation_counts(self, spark):
        df = with_extraction(web_pages_df(spark, N_FIXTURE, partitions=8))
        counts = dict(
            df.groupBy("extraction.error").count().collect()
        )
        # ~1% empty, ~2% malformed per FIXTURES.md; never a job failure.
        errs = {k: v for k, v in counts.items() if k is not None}
        assert sum(errs.values()) < N_FIXTURE * 0.06
        assert counts.get(None, 0) > N_FIXTURE * 0.9

    def test_domain_parse_native(self, spark):
        df = web_pages_df(spark, 50, partitions=2).select(
            "url", domain_of("url").alias("domain")
        )
        for r in df.collect():
            assert r.url.startswith(f"https://{r.domain}/")

    def test_golden_sha_matches_text(self, spark):
        row = web_pages_pdf(1).iloc[0]
        r = extract_document(row.html)
        assert r.text_sha256 == hashlib.sha256(r.text.encode()).hexdigest()
