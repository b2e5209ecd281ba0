"""X145 Gries' DP word dispersion (queries.dispersion_report): exact
python mirror over planted multi-source corpora, perfectly-even word
DP=0, single-part-exclusive word DP = 1 - s_i with dp_norm -> 1 under
equal parts, absence-from-a-part as signal via the dense grid,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_DISPERSION)."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _DP_WORDS, dispersion_report

SF = "/root/testdata/sf0.001"


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(docs):
    tc = {}
    for src, text in docs:
        for tok in _toks(text):
            tc[(src, tok)] = tc.get((src, tok), 0) + 1
    parts = {}
    corpus = {}
    for (src, tok), c in tc.items():
        parts[src] = parts.get(src, 0) + c
        corpus[tok] = corpus.get(tok, 0) + c
    tt = sum(parts.values())
    tmin = min(parts.values())
    panel = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:_DP_WORDS]
    out = []
    for w, cw in sorted(panel):
        nd = sum(
            abs(tc.get((src, w), 0) * tt - ti * cw)
            for src, ti in parts.items()
        )
        dp = nd / (2.0 * cw * tt)
        out.append(
            dict(
                word=w,
                c_total=cw,
                n_parts=len(parts),
                nd_exact=nd,
                dp=round(dp, 6),
                dp_norm=round(dp / (1.0 - tmin / tt), 6)
                if tmin < tt
                else None,
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
    return [r.asDict() for r in dispersion_report(spark, sf).collect()]


def test_dp_even_word_zero(spark):
    # 'zz' appears in proportion to part sizes everywhere -> DP = 0
    docs = [
        ("a", "zz aa zz bb"),
        ("b", "zz cc zz dd"),
        ("c", "zz ee zz ff"),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {r["word"]: r for r in got}
    assert by["zz"]["dp"] == 0.0 and by["zz"]["nd_exact"] == 0


def test_dp_exclusive_word_closed_form(spark):
    # 'qq' lives only in part a; equal part sizes (4 tokens each):
    # DP = 1 - s_a = 2/3, dp_norm = DP/(1 - 1/3) = 1
    docs = [
        ("a", "qq qq qq qq"),
        ("b", "aa bb cc dd"),
        ("c", "ee ff gg hh"),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {r["word"]: r for r in got}
    assert by["qq"]["dp"] == round(2 / 3, 6)
    assert by["qq"]["dp_norm"] == 1.0


def test_dp_absence_is_signal(spark):
    # 'mid' sits in 2 of 3 equal parts: 0 < DP < the exclusive case
    docs = [
        ("a", "mid mid xx yy"),
        ("b", "mid mid zz ww"),
        ("c", "pp qq rr ss"),
    ]
    got = _collect(spark, _write(docs))
    assert got == _mirror(docs)
    by = {r["word"]: r for r in got}
    assert 0.0 < by["mid"]["dp"] < round(2 / 3, 6)


def test_dp_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert 0 < len(a) <= _DP_WORDS
    for r in a:
        assert 0.0 <= r["dp"] <= 1.0
        assert r["dp_norm"] is None or r["dp_norm"] >= r["dp"] - 1e-9
    from tests.test_plans import plan_of

    plan = plan_of(dispersion_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
