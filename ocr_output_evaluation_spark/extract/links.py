"""X77 — hyperlink extraction: the crawl-graph side of the extraction
stage. Pulls <a href> targets out of the same HTML blobs the
main-content extractor consumes, so the engine can build the REAL link
graph of a Common-Crawl-style table and feed it to the graph layer
(PageRank/TrustRank/HITS/k-core already operate on edge frames). This is
how the published web-corpus pipelines derive their quality priors —
e.g. Common Crawl's host-level web graphs and the TrustRank seed
propagation both start from exactly this (url -> href) edge list.

DELIBERATELY a separate module from html_extractor.py:
`extraction_version()` hashes that module's source, and link extraction
must not shift the byte-identity contract of extracted text (CLAUDE.md
hard invariant). The parser mirrors the extractor's decode discipline
(strict utf-8, in-band error classes, never raises — the D3
failure-isolation rule of /root/reference/parallel_processor.py:90-95).

Spark-first shape, and how it holds at 100 TB:
- link extraction rides the SAME Arrow-batched pandas-UDF channel as the
  extractor (per-row Python is allowed in extract/ — the sanctioned
  boundary); output is one array<string> per page.
- the edge list is explode -> in-row normalization; graph analytics
  downstream are the existing operators — nothing new shuffles here
  beyond the explode's own map-side output.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["extract_links", "with_links", "link_edges"]

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")


class _HrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag != "a":
            return
        for k, v in attrs:
            if k == "href" and v is not None:
                self.hrefs.append(v)
                return


def _normalize(href: str, base_url: str | None) -> str | None:
    h = href.strip()
    if not h or h.startswith("#"):
        return None
    if h.lower().startswith(_SKIP_SCHEMES):
        return None
    if base_url:
        try:
            h = urljoin(base_url, h)
        except ValueError:
            return None
    try:
        parts = urlsplit(h)
    except ValueError:
        return None
    if parts.scheme and parts.scheme not in ("http", "https", ""):
        return None
    # drop the fragment; keep query (distinct crawl targets)
    return urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))


def extract_links(
    html_bytes: bytes | None, base_url: str | None = None
) -> list[str]:
    """Ordered, de-duplicated <a href> targets of an HTML payload;
    [] for empty/PDF/undecodable/unparsable input (links are a
    best-effort side channel — error classes stay with the text
    extractor). Fragments are dropped, javascript:/mailto:/data:/tel:
    and non-http(s) schemes skipped, and relative targets resolved
    against ``base_url`` when given. Pure function of its inputs."""
    if html_bytes is None or len(html_bytes) == 0:
        return []
    if html_bytes[:5] == b"%PDF-":
        return []
    try:
        doc = html_bytes.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return []
    p = _HrefParser()
    try:
        p.feed(doc)
        p.close()
    except Exception:  # html.parser almost never raises; isolate anyway
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in p.hrefs:
        n = _normalize(raw, base_url)
        if n is not None and n not in seen:
            seen.add(n)
            out.append(n)
    return out


def with_links(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Append ``links`` array<string> — extract_links over the Arrow
    channel, resolving each page's relative hrefs against its own url."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _links(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_links(
                    None if h is None else bytes(h),
                    None if u is None else str(u),
                )
                for h, u in zip(html, url)
            ]
        )

    return df.withColumn("links", _links(F.col(html_col), F.col(url_col)))


def link_edges(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (src, dst): the page-level edge list (explode of ``links``;
    pages with no links produce no rows). Feed host-level rollups or the
    graph operators directly."""
    return with_links(df, html_col, url_col).select(
        F.col(url_col).alias("src"), F.explode("links").alias("dst")
    )
