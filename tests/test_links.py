"""X77 hyperlink extraction (extract/links.py): href goldens
(normalization, scheme filtering, fragment dropping, base resolution,
order-preserving dedup), never-raises robustness fuzz, in-band empty
classes (PDF/empty/undecodable), Arrow-UDF parity with the pure
function over the page fixtures, the version-isolation invariant, and
the graph-layer composition (PageRank over the extracted edges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.extract.links import (
    extract_links,
    link_edges,
    with_links,
)

FAST = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def test_golden_extraction():
    html = b"""
    <html><body>
      <a href="/a">one</a>
      <a href = "/a">dup</a>
      <a href="b.html#frag">two</a>
      <a href="#top">skip-fragment</a>
      <a href="javascript:void(0)">skip-js</a>
      <a href="MAILTO:x@y.z">skip-mail</a>
      <a href="ftp://files.example.com/f">skip-scheme</a>
      <a href="https://other.example.org/q?x=1#y">abs</a>
      <a name="anchor-without-href">skip</a>
      <div><a href="  /c  ">trimmed</a></div>
    </body></html>
    """
    got = extract_links(html, base_url="https://host.example.com/p/page1")
    assert got == [
        "https://host.example.com/a",
        "https://host.example.com/p/b.html",  # relative to the base PATH
        "https://other.example.org/q?x=1",
        "https://host.example.com/c",
    ]
    # without a base, relative targets pass through (fragment stripped)
    raw = extract_links(html)
    assert raw[0] == "/a" and raw[1] == "b.html"


def test_inband_empty_classes():
    assert extract_links(None) == []
    assert extract_links(b"") == []
    assert extract_links(b"%PDF-1.4 whatever") == []
    assert extract_links(b"<a href='/x'>\xff\x80 broken") == []  # bad utf-8


@settings(**FAST)
@given(data=st.binary(max_size=400))
def test_never_raises(data):
    out = extract_links(data, base_url="https://h.example.com/")
    assert isinstance(out, list)
    assert all(isinstance(u, str) for u in out)


def test_version_isolation():
    """Adding/changing link extraction must not move the byte-identity
    contract: extraction_version() hashes html_extractor + pdf_extractor
    sources only, and links.py is a separate module."""
    import inspect

    from ocr_output_evaluation_spark.extract import html_extractor

    assert "extract_links" not in inspect.getsource(html_extractor)


def test_udf_parity_and_fixture_shape(spark):
    from ocr_output_evaluation_spark.fixtures.generate import (
        web_pages_df,
        web_pages_pdf,
    )

    n = 300
    df = with_links(web_pages_df(spark, n, 4))
    got = {r.url: list(r.links) for r in df.select("url", "links").collect()}
    pdf = web_pages_pdf(n)
    assert len(got) == n
    for _, row in pdf.iterrows():
        want = extract_links(row.html, base_url=row.url)
        assert got[row.url] == want, row.url
    # fixture pages carry 4 link farms over targets /x0../x11 -> exactly
    # 12 unique same-host links per HTML page; PDFs/broken rows none
    htmls = [
        r for _, r in pdf.iterrows()
        if r.html and r.html[:5] != b"%PDF-" and b"<html>" in r.html[:20]
    ]
    assert htmls
    for r in htmls[:20]:
        ls = got[r.url]
        assert len(ls) == 12
        host = r.url.split("/")[2]
        assert all(u.startswith(f"https://{host}/x") for u in ls)


def test_pagerank_composition(spark):
    """The point of the operator: the extracted edge list feeds the graph
    layer directly. Hub targets (/x0..) must out-rank ordinary pages."""
    from ocr_output_evaluation_spark.fixtures.generate import web_pages_df
    from ocr_output_evaluation_spark.operators.pagerank import pagerank

    edges = link_edges(web_pages_df(spark, 200, 4)).filter(
        F.col("src") != F.col("dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = pagerank(nodes, edges, n_iters=3)
    rows = pr.orderBy(F.col("rank_nano").desc(), F.col("node")).limit(10).collect()
    assert rows and all("/x" in r.node for r in rows)
    # deterministic: a second run returns identical ranks
    pr2 = pagerank(nodes, edges, n_iters=3)
    assert sorted(map(tuple, pr.collect())) == sorted(map(tuple, pr2.collect()))


def test_report_runs(spark):
    from ocr_output_evaluation_spark.queries import link_graph_report

    rows = link_graph_report(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_host = {r.host: r for r in rows}
    for h, r in by_host.items():
        assert r.n_pages > 0
        if r.n_edges:
            assert r.top_dst.startswith(f"https://{h}/x")
            assert r.distinct_dst <= 12
