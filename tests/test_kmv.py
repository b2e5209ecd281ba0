"""X131 KMV distinct sketch (queries.kmv_distinct_report): exact python
mirror over planted vocabularies, n<=k sketches are exact with NULL
kth_hash, n>k estimator matches the (k-1)/U_(k) closed form, the
'__union__' row equals a merge-and-truncate of the per-source sketches
(the KMV mergeability identity, pinned independently of the impl's
global-frame shortcut), determinism + plan pins. DuckDB value identity
is the oracle gate's job (ORACLE_KMV_DISTINCT)."""

from __future__ import annotations

import hashlib
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import kmv_distinct_report

SF = "/root/testdata/sf0.001"
K = 64
TWO60 = 1152921504606846976


def _h(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _sketch_row(source, vocab):
    n = len(vocab)
    hs = sorted((_h(tok), tok) for tok in vocab)
    kth = hs[K - 1][0] if n > K else None
    est = float(n) if n <= K else (K - 1) * 1152921504606846976.0 / kth
    return dict(
        source=source,
        n_exact=n,
        k_used=min(K, n),
        kth_hash=kth,
        est=round(est, 6),
        rel_err=round((est - n) / n, 6) if n > 0 else None,
    )


def _mirror(docs):
    vocabs = {}
    for source, text in docs:
        vocabs.setdefault(source, set()).update(_toks(text))
    rows = [_sketch_row(s, v) for s, v in vocabs.items()]
    union = set().union(*vocabs.values()) if vocabs else set()
    rows.append(_sketch_row("__union__", union))
    return sorted(rows, key=lambda r: r["source"])


def _write(docs):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang="en", source=src, n_chars=len(s))
            for i, (src, s) in enumerate(docs)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in kmv_distinct_report(spark, sf).collect()]


def _words(tag, n):
    # deterministic distinct ascii words
    return [
        "w"
        + hashlib.sha256(f"{tag}:{i}".encode()).hexdigest()[:8]
        for i in range(n)
    ]


def test_kmv_small_vocab_exact(spark):
    docs = [("a", " ".join(_words("a", 30))), ("b", " ".join(_words("b", 10)))]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    for r in got:
        assert r["kth_hash"] is None and r["rel_err"] == 0.0
        assert r["est"] == float(r["n_exact"])


def test_kmv_large_vocab_estimates(spark):
    docs = [("a", " ".join(_words("a", 500)))]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {r["source"]: r for r in got}
    r = by["a"]
    assert r["kth_hash"] is not None and r["k_used"] == K
    # k=64 gives sigma ~ 1/sqrt(k-2) ~ 12.7%; this fixture lands well in
    assert abs(r["rel_err"]) < 0.4
    assert by["__union__"] == {**r, "source": "__union__"}


def test_kmv_union_is_sketch_merge(spark):
    # mergeability: the union row must equal merge-and-truncate of the
    # per-source k-minimum lists (computed here WITHOUT the global set)
    docs = [
        ("a", " ".join(_words("a", 300))),
        ("b", " ".join(_words("b", 300))),
        ("c", " ".join(_words("a", 100) + _words("c", 150))),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    sketches = []
    exact_union = set()
    for src in ("a", "b", "c"):
        vocab = set()
        for s, text in docs:
            if s == src:
                vocab.update(_toks(text))
        exact_union |= vocab
        sketches.append(sorted(_h(tok) for tok in vocab)[:K])
    merged = sorted(set().union(*map(set, sketches)))[:K]
    kth = merged[K - 1]
    est = round((K - 1) * 1152921504606846976.0 / kth, 6)
    u = {r["source"]: r for r in got}["__union__"]
    assert u["kth_hash"] == kth and u["est"] == est
    assert u["n_exact"] == len(exact_union)


def test_kmv_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    srcs = [r["source"] for r in a]
    assert "__union__" in srcs and len(srcs) > 2
    u = {r["source"]: r for r in a}["__union__"]
    assert all(r["n_exact"] <= u["n_exact"] for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(kmv_distinct_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
