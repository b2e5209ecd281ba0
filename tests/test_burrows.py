"""X141 Burrows' Delta stylometry (queries.burrows_delta_report): exact
python mirror over planted multi-source corpora, style-sharing pair
scores below the cross-style pairs, missing-function-word-as-signal via
the dense grid, all-identical corpus collapses to no standardizable
words, determinism + plan pins. DuckDB value identity is the oracle
gate's job (ORACLE_BURROWS_DELTA)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    _DELTA_WORDS,
    burrows_delta_report,
)

SF = "/root/testdata/sf0.001"


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(docs):
    tc = {}
    for src, text in docs:
        for tok in _toks(text):
            tc[(src, tok)] = tc.get((src, tok), 0) + 1
    totals = {}
    corpus = {}
    for (src, tok), c in tc.items():
        totals[src] = totals.get(src, 0) + c
        corpus[tok] = corpus.get(tok, 0) + c
    panel = [
        t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_DELTA_WORDS]
    freq = {
        (src, tok): math.floor(
            tc.get((src, tok), 0) / totals[src] * 1e6 + 0.5
        )
        for src in totals
        for tok in panel
    }
    k = len(totals)
    keep = {}
    for tok in panel:
        fs = [freq[(s, tok)] for s in totals]
        v = k * sum(f * f for f in fs) - sum(fs) ** 2
        if v > 0:
            keep[tok] = v
    out = []
    srcs = sorted(totals)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            terms = {
                tok: round(
                    abs(freq[(a, tok)] - freq[(b, tok)])
                    * float(k)
                    / math.sqrt(v)
                    * 1e9
                )
                for tok, v in keep.items()
            }
            if not terms:
                continue
            ssum = sum(terms.values())
            top = max((z, t) for t, z in terms.items())
            out.append(
                dict(
                    source_a=a,
                    source_b=b,
                    n_words=len(terms),
                    sum_z_nano=ssum,
                    delta=round(ssum / (1e9 * len(terms)), 6),
                    top_word=top[1],
                    top_z_nano=top[0],
                )
            )
    return out


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
    return [r.asDict() for r in burrows_delta_report(spark, sf).collect()]


def test_burrows_identical_corpus_empty(spark):
    # every source writes the same text: no word varies across sources,
    # nothing is standardizable -> no output rows
    docs = [("a", "alpha beta gamma"), ("b", "alpha beta gamma")]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs) == []


def test_burrows_style_pairs_cluster(spark):
    # a and b share a function-word profile (heavy 'zz'), c has its own
    # (heavy 'qq'): delta(a,b) < delta(a,c) and < delta(b,c)
    docs = [
        ("a", "zz zz zz zz alpha beta"),
        ("a", "zz zz gamma delta zz"),
        ("b", "zz zz zz epsilon zeta zz"),
        ("b", "zz eta theta zz zz"),
        ("c", "qq qq qq iota kappa"),
        ("c", "qq qq lam mu qq"),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {(r["source_a"], r["source_b"]): r["delta"] for r in got}
    assert by[("a", "b")] < by[("a", "c")]
    assert by[("a", "b")] < by[("b", "c")]


def test_burrows_missing_word_is_signal(spark):
    # 'the' is frequent in a and b but ABSENT from c: the dense grid
    # gives c a zero frequency and 'the' drives c's distances
    docs = [
        ("a", "the cat the dog the bird"),
        ("b", "the sun the moon the star"),
        ("c", "rock stone cliff sand dust pebble"),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {(r["source_a"], r["source_b"]): r for r in got}
    assert by[("a", "c")]["top_word"] == "the"
    assert by[("a", "b")]["delta"] < by[("a", "c")]["delta"]


def test_burrows_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    srcs = {r["source_a"] for r in a} | {r["source_b"] for r in a}
    k = len(srcs)
    assert len(a) == k * (k - 1) // 2
    for r in a:
        assert 0 < r["n_words"] <= _DELTA_WORDS and r["delta"] >= 0
    from tests.test_plans import plan_of

    plan = plan_of(burrows_delta_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
