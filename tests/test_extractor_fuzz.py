"""Property-based robustness for the pure extractor (hypothesis).

The 100 TB contract: extract_document is TOTAL (never raises on any bytes —
errors are in-band, D3), DETERMINISTIC (same bytes -> same result), and its
whitespace normalization invariants hold on whatever survives extraction.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_output_evaluation_spark.extract import extract_document

TAGS = ["p", "div", "a", "nav", "script", "style", "br", "h2", "td", "article", "x-y"]

tag_bits = st.sampled_from(
    ["<%s>" % t for t in TAGS]
    + ["</%s>" % t for t in TAGS]
    + ["<%s/>" % t for t in TAGS]
    + ["<!-- c -->", "<!DOCTYPE html>", "<?pi?>", "<", ">", "</", "<!", "&amp;", "&#65;", "&bogus;", "&"]
)
text_bits = st.text(max_size=40)
html_ish = st.lists(st.one_of(tag_bits, text_bits), max_size=40).map("".join)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_total_and_deterministic_on_html_ish(s: str) -> None:
    b = s.encode("utf-8")
    r1 = extract_document(b)
    r2 = extract_document(b)
    assert (r1.text, r1.n_blocks_kept, r1.n_blocks_dropped, r1.is_pdf, r1.error) == (
        r2.text,
        r2.n_blocks_kept,
        r2.n_blocks_dropped,
        r2.is_pdf,
        r2.error,
    )
    if r1.error is None:
        assert r1.text is not None
        for line in r1.text.split("\n"):
            assert line == " ".join(line.split()), "kept block not whitespace-normalized"
    else:
        assert r1.text is None


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2000))
def test_total_on_arbitrary_bytes(b: bytes) -> None:
    r = extract_document(b)
    # any outcome is fine; raising is not
    assert r.error is None or isinstance(r.error, str)
    if b[:5] == b"%PDF-":
        assert r.is_pdf


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=400))
def test_pdf_branch_total(b: bytes) -> None:
    r = extract_document(b"%PDF-" + b)
    assert r.is_pdf
    assert r.error is None or isinstance(r.error, str)
