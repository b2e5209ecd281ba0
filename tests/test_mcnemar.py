"""X112 McNemar's paired test (queries.mcnemar_report): exact-integer
python mirror with its own naive predictors, planted discordance grids
(A-dominant, symmetric-discordance chi2=0, no-discordance NULL guard),
textbook chi2 value, determinism + cell-partition invariant, plan pins.
DuckDB value identity is the oracle gate's job (_oracle_mcnemar)."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.functions.text import STOPWORDS
from ocr_output_evaluation_spark.queries import mcnemar_report

SF = "/root/testdata/sf0.001"


def _pred_a(text):
    hits = {
        lang: len(re.findall(r"\b(" + "|".join(ws) + r")\b", text.lower()))
        for lang, ws in STOPWORDS.items()
    }
    mx = max(hits.values())
    if mx == 0:
        return "und"
    for lang in STOPWORDS:  # first-occurrence tie -> earliest lang
        if hits[lang] == mx:
            return lang
    raise AssertionError


def _mirror(rows):
    """rows: list[(lang, text)] -> the single report dict."""
    n = {"n_both": 0, "n_a_only": 0, "n_b_only": 0, "n_neither": 0}
    for lang, text in rows:
        truth = lang == "en"
        a_ok = (_pred_a(text) == "en") == truth
        b_ok = bool(re.search(r"\bthe\b", text.lower())) == truth
        key = (
            "n_both"
            if a_ok and b_ok
            else "n_a_only"
            if a_ok
            else "n_b_only"
            if b_ok
            else "n_neither"
        )
        n[key] += 1
    nd = len(rows)
    b, c = n["n_a_only"], n["n_b_only"]
    return dict(
        n_docs=nd,
        **n,
        acc_a=round((n["n_both"] + b) / nd, 6),
        acc_b=round((n["n_both"] + c) / nd, 6),
        chi2=round((b - c) ** 2 / (b + c), 6) if b + c > 0 else None,
        chi2_cc=round((abs(b - c) - 1) ** 2 / (b + c), 6) if b + c > 0 else None,
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
    return mcnemar_report(spark, sf).collect()[0].asDict()


# fixture texts: EN_FULL satisfies both detectors; EN_STOPW_ONLY only the
# stopword detector ("the" absent); EN_KEYW_ONLY only the keyword one
# (German stopwords dominate); NON_EN fools neither.
EN_FULL = "the cat and the dog walked to the house"
EN_STOPW_ONLY = "a cat and a dog walked to a house of it"
EN_KEYW_ONLY = "der hund und die katze liefen zu the und der haus"
NON_EN = "zzz qqq xxx www yyy"


def test_mcnemar_a_dominant(spark):
    # A right where B is wrong on 4 docs, B never uniquely right:
    # b=4, c=0 -> chi2 = 16/4 = 4, chi2_cc = 9/4
    rows = [("en", EN_STOPW_ONLY)] * 4 + [("en", EN_FULL)] * 4 + [("de", NON_EN)] * 2
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["n_a_only"] == 4 and got["n_b_only"] == 0
    assert got["chi2"] == 4.0 and got["chi2_cc"] == 2.25


def test_mcnemar_symmetric_discordance_chi2_zero(spark):
    # b == c -> chi2 = 0 exactly (and cc = 1/(b+c) = 0.25 at b=c=2)
    rows = (
        [("en", EN_STOPW_ONLY)] * 2
        + [("en", EN_KEYW_ONLY)] * 2
        + [("en", EN_FULL)] * 3
    )
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["n_a_only"] == got["n_b_only"] == 2
    assert got["chi2"] == 0.0 and got["chi2_cc"] == 0.25


def test_mcnemar_no_discordance_null(spark):
    rows = [("en", EN_FULL)] * 3 + [("de", NON_EN)] * 2
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["chi2"] is None and got["chi2_cc"] is None
    assert got["acc_a"] == 1.0 and got["acc_b"] == 1.0


def test_mcnemar_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert (
        a["n_both"] + a["n_a_only"] + a["n_b_only"] + a["n_neither"] == a["n_docs"]
    )
    assert 0.0 <= a["acc_a"] <= 1.0 and 0.0 <= a["acc_b"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(mcnemar_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
