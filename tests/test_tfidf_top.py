"""X128 TF-IDF top terms per source (queries.tfidf_top_report):
exact-nano python mirror, source-exclusive terms outrank shared ones,
everywhere-terms score exactly 0 (idf=0) and lose to any exclusive
term, tf breaks idf ties, alphabetical tiebreak at equal score,
determinism + rank invariants, plan pins. DuckDB value identity is the
oracle gate's job (ORACLE_TFIDF_TOP)."""

from __future__ import annotations

import math
import os
import re
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import tfidf_top_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    tf = Counter()
    for s, text in rows:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
        for t in norm.split(" "):
            if t:
                tf[(s, t)] += 1
    df = Counter(t for _, t in tf)
    ns = len({s for s, _ in tf})
    out = []
    for s in sorted({s for s, _ in tf}):
        scored = []
        for (s2, t), n in tf.items():
            if s2 != s:
                continue
            idf = round(math.log(ns / df[t]) * 1e9)
            scored.append((-n * idf, t, n, df[t], idf))
        scored.sort()
        for rank, (neg, t, n, d, idf) in enumerate(scored[:5], 1):
            out.append(
                dict(
                    source=s,
                    rank=rank,
                    token=t,
                    tf=n,
                    df=d,
                    idf_nano=idf,
                    score_nano=-neg,
                )
            )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for _, t in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [len(t) for _, t in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in tfidf_top_report(spark, sf).collect()]


def test_tfidf_exclusive_beats_shared(spark):
    rows = [
        ("a", "zebra zebra common common common"),
        ("b", "yak common common"),
    ]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {(r["source"], r["rank"]): r for r in got}
    assert by[("a", 1)]["token"] == "zebra"  # exclusive, tf=2
    assert by[("b", 1)]["token"] == "yak"
    # 'common' is in both sources: idf = ln(2/2) = 0 exactly
    assert all(r["score_nano"] == 0 for r in got if r["token"] == "common")


def test_tfidf_tf_breaks_idf_tie(spark):
    rows = [("a", "big big big small other"), ("b", "filler")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    a = [r for r in got if r["source"] == "a"]
    assert a[0]["token"] == "big" and a[0]["tf"] == 3
    # equal tf=1, equal idf -> alphabetical: 'other' before 'small'
    assert [r["token"] for r in a[1:3]] == ["other", "small"]


def test_tfidf_top5_cap(spark):
    rows = [("a", "q w e r t y u i o p"), ("b", "zz")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert len([r for r in got if r["source"] == "a"]) == 5


def test_tfidf_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    srcs = {r["source"] for r in a}
    assert len(a) == 5 * len(srcs)
    for s in srcs:
        rows = [r for r in a if r["source"] == s]
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        scores = [r["score_nano"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    from tests.test_plans import plan_of

    plan = plan_of(tfidf_top_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
