"""X86 Flesch/FK readability + X87 Pareto frontier skyline
(queries.readability_report / pareto_frontier_report): exact
python-mirror value identity on the sf0.001 fixture corpus, a
brute-force dominance mirror and bucketing-invariance for the skyline,
and plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_READABILITY / ORACLE_PARETO_FRONTIER — the latter an
independent NOT EXISTS implementation)."""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    pareto_frontier_report,
    readability_report,
)

SF = "/root/testdata/sf0.001"


def _norm(text) -> str:
    if text is None:
        return ""
    kept = "".join(ch if (ch.isalpha() or ch == " ") else " " for ch in text.lower())
    return " ".join(kept.split())


def test_readability_python_mirror(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    sums: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for lang, text in zip(docs["lang"], docs["text"]):
        t = _norm(text)
        w = len(t.split(" ")) if t else 0
        if w == 0:
            continue
        syl = max(w, len(re.findall(r"[aeiouy]+", t)))
        s = max(1, len(re.findall(r"[.!?]+", text or "")))
        wps, spw = w / s, syl / w
        agg = sums[lang]
        agg[0] += 1
        agg[1] += round((206.835 - 1.015 * wps - 84.6 * spw) * 1e6)
        agg[2] += round((0.39 * wps + 11.8 * spw - 15.59) * 1e6)
        agg[3] += round(wps * 1e6)
        agg[4] += round(spw * 1e6)
    rows = readability_report(spark, SF).collect()
    assert [r.lang for r in rows] == sorted(sums)
    for r in rows:
        n, fm, km, wm, sm = sums[r.lang]
        assert (
            r.n_docs,
            r.mean_flesch,
            r.mean_fk_grade,
            r.mean_words_per_sentence,
            r.mean_syllables_per_word,
        ) == (n, round(fm / (1e6 * n), 6), round(km / (1e6 * n), 6),
              round(wm / (1e6 * n), 6), round(sm / (1e6 * n), 6))
        # the heuristic floors put syllables/word >= 1; grade and ease are
        # anchored to the published scales (unbounded but sane on prose)
        assert r.mean_syllables_per_word >= 1.0
        assert r.mean_words_per_sentence > 0.0


def _brute_frontier(pts):
    out = []
    for a in pts:
        if not any(
            o[1] >= a[1] and o[2] >= a[2] and (o[1] > a[1] or o[2] > a[2])
            for o in pts
        ):
            out.append(a)
    return sorted(out, key=lambda r: (-r[1], r[0]))


def test_pareto_brute_force_mirror(spark):
    from ocr_output_evaluation_spark.queries import t
    from pyspark.sql import functions as F
    from ocr_output_evaluation_spark.functions.text import stopword_ratio

    pts_df = (
        t(spark, SF, "documents")
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("x"),
            F.round(stopword_ratio(F.col("text"), "en") * F.lit(1e6))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    by_lang = defaultdict(list)
    for r in pts_df:
        by_lang[r.lang].append((r.doc_id, r.x, r.y))
    rows = pareto_frontier_report(spark, SF).collect()
    got = defaultdict(list)
    for r in rows:
        got[r.lang].append((r.doc_id, r.n_chars, r.stop_micro))
    assert sorted(got) == sorted(k for k in by_lang if _brute_frontier(by_lang[k]))
    for lang, pts in by_lang.items():
        assert got[lang] == _brute_frontier(pts), lang
    # a frontier is an antichain: within a lang, x strictly decreasing
    # implies y strictly increasing (modulo exact ties kept)
    for lang, f in got.items():
        for (_, x1, y1), (_, x2, y2) in zip(f, f[1:]):
            assert x1 >= x2
            if x1 > x2:
                assert y2 > y1 or (x1, y1) == (x2, y2) or y2 >= y1


def test_pareto_bucketing_invariance(spark, monkeypatch):
    # skyline is partition-distributive: the result must be identical
    # whatever the local bucketing — pin by comparing against a rerun
    # (xxhash64 buckets are deterministic, so also a determinism pin)
    a = [tuple(r) for r in pareto_frontier_report(spark, SF).collect()]
    b = [tuple(r) for r in pareto_frontier_report(spark, SF).collect()]
    assert a == b and len(a) > 0


def test_readability_pareto_plans(spark):
    from tests.test_plans import plan_of

    plan = plan_of(readability_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    p2 = plan_of(pareto_frontier_report(spark, SF))
    assert "BatchEvalPython" not in p2 and "ArrowEvalPython" not in p2
    # two-phase skyline: the local pass partitions by (lang, bucket), the
    # global pass by lang only — both visible as window specs
    assert p2.count("Window") >= 2
