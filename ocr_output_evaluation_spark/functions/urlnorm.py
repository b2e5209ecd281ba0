"""URL canonicalization as pure Spark column expressions (X123).

The RFC 3986 §6 normalization subset every web-crawl dedup pipeline
applies before URL-keyed dedup (Lee et al. 2022 dedup pipelines;
the Common Crawl URL index's canonical form):

1. fragment stripped (`#...` never reaches the server);
2. scheme and host lowercased (case-insensitive per RFC 3986 §3.1/3.2.2);
3. default ports dropped (`:80` for http, `:443` for https);
4. path: `/./` segments removed, duplicate slashes collapsed, trailing
   slash stripped (empty path == "/");  NOTE: `..` segments are NOT
   resolved — a relative-ascent URL is left verbatim (documented subset;
   resolving requires an unbounded loop, and crawl frontiers reject them
   upstream);
5. query: parameters split on `&`, tracking params (`utm_*`, `fbclid`,
   `gclid`) and empties dropped, the rest BYTE-SORTED and rejoined —
   param order never changes server semantics for idempotent GETs, and
   sorting makes the canonical form unique.

Everything is codegen string expressions (no UDF, no per-row Python);
the DuckDB twin in queries._oracle_url_canon replays the identical
steps with list_filter/list_sort. Reference analog: none — rebuild-only
(SURVEY §2.13)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = ("utm_", "fbclid", "gclid")


def canonical_url(c: Column) -> Column:
    """Canonicalize one URL column (see module docstring for the exact
    normalization subset)."""
    # 1. strip fragment
    u = F.substring_index(c, "#", 1)
    # split scheme :// rest
    scheme = F.lower(F.substring_index(u, "://", 1))
    rest = F.when(
        F.instr(u, "://") > 0,
        F.substring(u, F.instr(u, "://") + 3, F.length(u)),
    ).otherwise(F.lit(""))
    # split rest into hostport / path?query
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    after_host = F.when(
        F.instr(rest, "/") > 0,
        F.substring(rest, F.instr(rest, "/"), F.length(rest)),
    ).otherwise(F.lit(""))
    path = F.substring_index(after_host, "?", 1)
    query = F.when(
        F.instr(after_host, "?") > 0,
        F.substring(
            after_host, F.instr(after_host, "?") + 1, F.length(after_host)
        ),
    ).otherwise(F.lit(""))
    # 2-3. lowercase host, strip default port
    host = F.lower(hostport)
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    # 4. path normalization: /./ -> /, // -> /, strip trailing /
    p = F.regexp_replace(path, r"/\./", "/")
    p = F.regexp_replace(p, r"/\./", "/")  # twice: overlapping /././ chains
    p = F.regexp_replace(p, r"/{2,}", "/")
    p = F.regexp_replace(p, r"/$", "")
    p = F.when(p == "", F.lit("/")).otherwise(p)
    # 5. query: drop tracking + empties, byte-sort, rejoin
    parts = F.split(query, "&")
    keep = F.filter(
        parts,
        lambda x: (x != "")
        & ~F.lower(x).startswith(_TRACKING[0])
        & ~F.lower(x).startswith(_TRACKING[1])
        & ~F.lower(x).startswith(_TRACKING[2]),
    )
    q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        p,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
