"""X121 Cochran's Q over three English-detectors (queries.
cochran_q_report): exact-integer python mirror with its own predictors,
planted one-weak-detector grid with the textbook Q value, all-agree
zero-variance NULL guard, Q-degenerates-to-McNemar structural check,
determinism + histogram-partition invariants, plan pins. DuckDB value
identity is the oracle gate's job (_oracle_cochran_q)."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.functions.text import STOPWORDS
from ocr_output_evaluation_spark.queries import cochran_q_report

SF = "/root/testdata/sf0.001"


def _pred_a(text):
    hits = {
        lang: len(re.findall(r"\b(" + "|".join(ws) + r")\b", text.lower()))
        for lang, ws in STOPWORDS.items()
    }
    mx = max(hits.values())
    if mx == 0:
        return "und"
    for lang in STOPWORDS:
        if hits[lang] == mx:
            return lang
    raise AssertionError


def _hits_en(text):
    return len(
        re.findall(r"\b(" + "|".join(STOPWORDS["en"]) + r")\b", text.lower())
    )


def _mirror(rows):
    xs = []
    for lang, text in rows:
        truth = lang == "en"
        xa = int((_pred_a(text) == "en") == truth)
        xb = int(bool(re.search(r"\bthe\b", text.lower())) == truth)
        xc = int((_hits_en(text) >= 2) == truth)
        xs.append((xa, xb, xc))
    n = len(xs)
    ca = sum(x[0] for x in xs)
    cb = sum(x[1] for x in xs)
    cc = sum(x[2] for x in xs)
    rs = [sum(x) for x in xs]
    sum_r, sum_r2 = sum(rs), sum(r * r for r in rs)
    num = 2 * (3 * (ca * ca + cb * cb + cc * cc) - sum_r * sum_r)
    den = 3 * sum_r - sum_r2
    return dict(
        n_docs=n,
        c_a=ca,
        c_b=cb,
        c_c=cc,
        sum_r=sum_r,
        sum_r2=sum_r2,
        n_r0=sum(1 for r in rs if r == 0),
        n_r1=sum(1 for r in rs if r == 1),
        n_r2=sum(1 for r in rs if r == 2),
        n_r3=sum(1 for r in rs if r == 3),
        q_num=num,
        q_den=den,
        q_stat=round(num / den, 6) if den > 0 else None,
    )


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for _, t in rows],
            "lang": [lg for lg, _ in rows],
            "source": "src0",
            "n_chars": [len(t) for _, t in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return cochran_q_report(spark, sf).collect()[0].asDict()


# EN_ALL3: all three detectors right. EN_NO_KEYW: no 'the' so B is wrong,
# but 5 en-stopword hits (quick/dog/over vs STOPWORDS['en']) keep A and C
# right.
EN_ALL3 = "the cat and the dog walked to the house"
EN_NO_KEYW = "quick dog ran over a fence quick dog"
NON_EN = "zzz qqq xxx www yyy"


def test_cochran_all_agree_null(spark):
    # every detector right on every doc: R == 3 everywhere -> den = 0
    rows = [("en", EN_ALL3)] * 4 + [("de", NON_EN)] * 2
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["q_den"] == 0 and got["q_stat"] is None
    assert got["n_r3"] == 6


def test_cochran_one_weak_detector(spark):
    # B misses 'the'-less English 4 times; A and C always right:
    # C_A=C_C=6, C_B=2, T=14, R: four 2s + two 3s -> sum_r2=34
    # Q = 2*(3*(36+4+36)-196)/(42-34) = 2*32/8 = 8 exactly
    rows = [("en", EN_NO_KEYW)] * 4 + [("en", EN_ALL3)] * 2
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["q_stat"] == 8.0
    assert (got["c_a"], got["c_b"], got["c_c"]) == (6, 2, 6)


def test_cochran_mixed_truth(spark):
    rows = (
        [("en", EN_ALL3)] * 3
        + [("en", EN_NO_KEYW)] * 2
        + [("de", NON_EN)] * 3
        + [("de", EN_ALL3)] * 1  # German doc that looks English: all wrong
    )
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["n_r0"] == 1  # the liar doc defeats all three


def test_cochran_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert a["n_r0"] + a["n_r1"] + a["n_r2"] + a["n_r3"] == a["n_docs"]
    assert a["sum_r"] == a["c_a"] + a["c_b"] + a["c_c"]
    assert a["sum_r2"] == a["n_r1"] + 4 * a["n_r2"] + 9 * a["n_r3"]
    from tests.test_plans import plan_of

    plan = plan_of(cochran_q_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
