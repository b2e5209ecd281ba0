"""X123 URL canonicalization + canonical dedup (functions/urlnorm.py,
queries.url_canon_report): direct canonicalizer checks on tricky URLs
(case/port/fragment/dot-segments/tracking/param-sort, https :443,
no-query, bare host), python mirror of the planted-variant dedup
histogram, determinism + partition invariants, plan pins (no Python
eval — the canonicalizer must stay codegen). DuckDB value identity is
the oracle gate's job (ORACLE_URL_CANON)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import url_canon_report

SF = "/root/testdata/sf0.001"


def _canon_py(url):
    u = url.split("#", 1)[0]
    scheme, _, rest = u.partition("://")
    scheme = scheme.lower()
    if "/" in rest:
        i = rest.index("/")
        hostport, after = rest[:i], rest[i:]
    else:
        hostport, after = rest, ""
    hostport = hostport.split("?", 1)[0]
    path, _, query = after.partition("?")
    host = hostport.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[: -len(":80")]
    elif scheme == "https" and host.endswith(":443"):
        host = host[: -len(":443")]
    while "/./" in path:
        path = path.replace("/./", "/")
    while "//" in path:
        path = path.replace("//", "/")
    path = path.rstrip("/") or "/"
    keep = sorted(
        p
        for p in query.split("&")
        if p
        and not p.lower().startswith("utm_")
        and not p.lower().startswith("fbclid")
        and not p.lower().startswith("gclid")
    )
    q = "&".join(keep)
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def _spark_canon(spark, urls):
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.functions.urlnorm import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


CASES = [
    "HTTP://WWW.Example.COM:80/A/b?b=2&a=1&utm_source=x#frag",
    "https://host.com:443/x/./y//z/?gclid=1&k=v",
    "http://plain.org",
    "http://plain.org/?",
    "http://h.io/p/?utm_campaign=a&utm_medium=b",
    "http://h.io/p?z=1&y=2&x=3",
    "http://UPPER.net:8080/Keep/Case/In/Path",
    "http://t.co/a/b/c/",
]


def test_canonical_url_cases(spark):
    got = _spark_canon(spark, CASES)
    want = [_canon_py(u) for u in CASES]
    assert got == want
    # spot-pin the semantics, not just the mirror:
    assert got[0] == "http://www.example.com/A/b?a=1&b=2"
    assert got[1] == "https://host.com/x/y/z?k=v"
    assert got[2] == "http://plain.org/"
    assert got[4] == "http://h.io/p"
    assert got[5] == "http://h.io/p?x=3&y=2&z=1"
    assert got[6] == "http://upper.net:8080/Keep/Case/In/Path"  # non-default port kept
    assert got[7] == "http://t.co/a/b/c"


def _mirror_report(doc_ids):
    from collections import Counter

    canon = Counter()
    for i in doc_ids:
        base = f"example{i % 37}"
        seg = f"page{i % 53}"
        v1 = f"HTTP://WWW.{base.upper()}.COM:80/a/{seg}?b=2&a=1&utm_source=feed"
        v2 = f"http://www.{base}.com/a/{seg}?a=1&b=2#frag"
        v3 = (
            f"http://www.{base}.com/other/{seg}?a=1&b=2"
            if i % 10 == 0
            else f"http://www.{base}.com/a/./{seg}//?a=1&b=2&gclid=xyz"
        )
        for u in (v1, v2, v3):
            canon[_canon_py(u)] += 1
    hist = Counter(canon.values())
    sample = "|".join(sorted(canon)[:5])
    return [
        dict(
            cluster_size=sz,
            n_clusters=n,
            n_urls=3 * len(doc_ids),
            n_canonical=len(canon),
            sample_canon=sample,
        )
        for sz, n in sorted(hist.items())
    ]


def _write(doc_ids):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": doc_ids,
            "text": "x",
            "lang": "en",
            "source": "src0",
            "n_chars": 1,
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in url_canon_report(spark, sf).collect()]


def test_url_canon_planted_clusters(spark):
    # ids 0..19 with distinct (id%37, id%53) keys: id 0 and 10 split their
    # third variant -> two clusters of 2 + two singletons, eighteen 3s
    ids = list(range(20))
    got = _collect(spark, _write(ids))
    assert got == _mirror_report(ids)
    by = {r["cluster_size"]: r["n_clusters"] for r in got}
    assert by == {1: 2, 2: 2, 3: 18}
    assert got[0]["n_urls"] == 60 and got[0]["n_canonical"] == 22


def test_url_canon_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    r = a[0]
    assert sum(x["cluster_size"] * x["n_clusters"] for x in a) == r["n_urls"]
    assert sum(x["n_clusters"] for x in a) == r["n_canonical"]
    assert r["sample_canon"].count("|") == 4
    from tests.test_plans import plan_of

    plan = plan_of(url_canon_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
