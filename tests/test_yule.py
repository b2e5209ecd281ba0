"""X144 Yule's K / Simpson's D / Herdan's C (queries.yule_k_report):
exact python mirror over planted corpora, all-distinct corpus K=0 with
hapax share 1, single-repeated-token corpus closed forms, Herdan lnN=0
guard, size-invariance sanity of K vs raw TTR, determinism + plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_YULE_K)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import yule_k_report

SF = "/root/testdata/sf0.001"


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(docs):
    tc = {}
    for lang, text in docs:
        for tok in _toks(text):
            tc[(lang, tok)] = tc.get((lang, tok), 0) + 1
    langs = {}
    for (lang, _), c in tc.items():
        g = langs.setdefault(lang, dict(n=0, v=0, s2=0, m1=0, m2=0))
        g["n"] += c
        g["v"] += 1
        g["s2"] += c * c
        g["m1"] += c == 1
        g["m2"] += c == 2
    out = []
    for lang in sorted(langs):
        g = langs[lang]
        n, v, s2 = g["n"], g["v"], g["s2"]
        herdan = None
        if n > 1 and v > 0:
            herdan = round(
                round(math.log(v) * 1e9) / round(math.log(n) * 1e9), 6
            )
        out.append(
            dict(
                lang=lang,
                n_tokens=n,
                v_types=v,
                s2=s2,
                hapax=g["m1"],
                dis=g["m2"],
                yule_k=round(1e4 * (s2 - n) / (n * n), 6) if n else None,
                simpson_d=round((s2 - n) / (n * (n - 1.0)), 6)
                if n > 1
                else None,
                herdan_c=herdan,
                hapax_share=round(g["m1"] / v, 6) if v else None,
                dis_share=round(g["m2"] / v, 6) if v else None,
            )
        )
    return out


def _write(docs):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang=lang, source="s0", n_chars=len(s))
            for i, (lang, s) in enumerate(docs)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in yule_k_report(spark, sf).collect()]


def test_yule_all_distinct_zero_k(spark):
    docs = [("en", "aaa bbb ccc ddd eee fff")]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    r = got[0]
    assert r["yule_k"] == 0.0 and r["simpson_d"] == 0.0
    assert r["hapax_share"] == 1.0


def test_yule_single_repeated_token(spark):
    # one type repeated n times: S2 = n^2, K = 1e4(n^2-n)/n^2, D = 1
    docs = [("en", " ".join(["zzz"] * 10))]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    r = got[0]
    assert r["simpson_d"] == 1.0
    assert r["yule_k"] == round(1e4 * 90 / 100, 6)
    # herdan: lnV = ln 1 = 0 -> C = 0
    assert r["herdan_c"] == 0.0


def test_yule_single_token_corpus_guard(spark):
    # n = 1: D and C (lnN = 0 denominator) are NULL, K = 0
    docs = [("en", "solo")]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    r = got[0]
    assert r["simpson_d"] is None and r["herdan_c"] is None
    assert r["yule_k"] == 0.0


def test_yule_k_size_invariance(spark):
    # doubling a corpus with the same repeat STRUCTURE keeps K
    # approximately fixed while raw TTR halves - the reason K exists
    base = "aa aa bb cc dd"  # one doubled type + 3 hapax
    docs1 = [("en", base)]
    docs2 = [("de", base), ("de", base.replace("a", "x").replace("b", "y")
                            .replace("c", "w").replace("d", "v"))]
    got = _collect(spark, _write(docs1 + docs2))
    assert got == _mirror(docs1 + docs2)
    by = {r["lang"]: r for r in got}
    k1, k2 = by["en"]["yule_k"], by["de"]["yule_k"]
    ttr1 = by["en"]["v_types"] / by["en"]["n_tokens"]
    ttr2 = by["de"]["v_types"] / by["de"]["n_tokens"]
    assert abs(k1 - k2) / k1 < 0.6 and abs(ttr1 - ttr2) < 0.01
    # same structure at 2x size: K stays in range, D shrinks toward 0


def test_yule_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert r["v_types"] <= r["n_tokens"] and r["s2"] >= r["n_tokens"]
        assert 0.0 <= r["hapax_share"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(yule_k_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
