"""URL parsing / normalization expressions — the per-domain accounting layer
every web-corpus pipeline needs (host extraction, registered-domain rollup,
tracking-parameter stripping, path depth).

All native regexp expressions (codegen, scan-speed — no Python), restricted
to the syntax subset Java regex (Spark) and RE2 (DuckDB) interpret
identically so every consumer query is ANSI-SQL-replayable and
oracle-checked. Registered domain uses the last-two-labels heuristic —
correct for generic TLDs; a production run over real crawl data would swap
in a public-suffix-list broadcast join (documented, not needed for the
synthetic corpus whose planted hosts are all generic).

Reference analog: none (the reference keys by OCR volume ids, not URLs);
part of the training-data surface SURVEY §2.13 adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# scheme://host[:port][/path][?query][#fragment] — host stops at / ? # :
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_REG_DOMAIN = r"([^.]+\.[^.]+)$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Hostname of an absolute URL ('' when the input has no scheme://host
    prefix — in-band, never NULL, so group-bys keep malformed rows visible)."""
    return F.regexp_extract(_col(c), _HOST, 1)


def url_registered_domain(c: Column | str) -> Column:
    """Last two dot-labels of the host ('example.com' for
    'a.b.example.com'); the whole host when it has fewer than two labels."""
    h = url_host(c)
    d = F.regexp_extract(h, _REG_DOMAIN, 1)
    return F.when(d != "", d).otherwise(h)


def url_path_depth(c: Column | str) -> Column:
    """Number of non-empty path segments ('https://h/a/b/' -> 2, no path
    -> 0). Codegen: count '/' separators in the extracted path after
    collapsing duplicates and trailing slash."""
    p = F.regexp_extract(_col(c), _PATH, 1)
    norm = F.regexp_replace(F.regexp_replace(p, r"/+", "/"), r"/$", "")
    return (F.length(norm) - F.length(F.regexp_replace(norm, r"/", ""))).cast(
        "long"
    )


def strip_url_params(c: Column | str) -> Column:
    """URL with query string and fragment removed (the canonical form for
    exact-URL dedup — tracking params are the dominant near-dup source in
    crawl URL space)."""
    return F.regexp_replace(_col(c), r"[?#].*$", "")
