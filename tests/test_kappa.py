"""X106 Cohen's kappa (queries.kappa_report): exact-integer mirror over
planted confusion grids, perfect agreement kappa=1, chance-level
kappa~0, degenerate single-class NULL guard, determinism, plan pins.
DuckDB value identity is the oracle gate's job (_oracle_kappa)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import kappa_report

SF = "/root/testdata/sf0.001"

# one high-signal text per language so lang_id_scores predicts exactly
# the intended class (each word distinctive to its lang's stopword
# list); 'und' = no stopword hit at all
TEXT = {
    "en": "the quick fox jumps over the dog",
    "de": "der schnelle fuchs uber der hund",
    "fr": "le chien rapide pardessus le renard",
    "zh": "shan shui tian ren he",
    "und": "zzz qqq xxx www yyy",
}


def _r6(x):
    """Half-up 6dp round (Spark F.round / DuckDB round semantics —
    Python's round() is banker's and flips exact .5e-6 boundaries)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def _mirror(pairs):
    """pairs: list[(true_lang, pred_key)] -> 1-row dict."""
    cells = Counter(pairs)
    n = len(pairs)
    rows = Counter(t for t, _ in pairs)
    cols = Counter(p for _, p in pairs)
    classes = set(rows) | set(cols)
    oa = sum(c for (t, p), c in cells.items() if t == p)
    pe_num = sum(rows.get(k, 0) * cols.get(k, 0) for k in classes)
    den = n * n - pe_num
    return dict(
        n_docs=n,
        n_classes=len(classes),
        observed_agree=oa,
        expected_num=pe_num,
        p_observed=_r6(oa / n),
        p_expected=_r6(pe_num / (n * n)),
        kappa=_r6((n * oa - pe_num) / den) if den != 0 else None,
    )


def _write(pairs):
    tmp = tempfile.mkdtemp()
    texts = [TEXT[p] for _, p in pairs]
    pd.DataFrame(
        {
            "doc_id": range(len(pairs)),
            "text": texts,
            "lang": [t for t, _ in pairs],
            "source": "src0",
            "n_chars": [len(x) for x in texts],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _one(spark, sf):
    rows = kappa_report(spark, sf).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_kappa_perfect_agreement(spark):
    pairs = [(l, l) for l in ("en", "de", "fr") for _ in range(4)]
    got = _one(spark, _write(pairs))
    assert got == _mirror(pairs)
    assert got["kappa"] == 1.0


def test_kappa_mixed_with_und(spark):
    pairs = (
        [("en", "en")] * 6
        + [("en", "de")] * 2
        + [("de", "de")] * 5
        + [("de", "und")] * 1
        + [("fr", "zh")] * 2
    )
    got = _one(spark, _write(pairs))
    assert got == _mirror(pairs)
    assert 0.0 < got["kappa"] < 1.0


def test_kappa_degenerate_single_class(spark):
    # everything is 'en' and predicted 'en': pe == 1 -> NULL guard
    pairs = [("en", "en")] * 5
    got = _one(spark, _write(pairs))
    assert got == _mirror(pairs)
    assert got["kappa"] is None and got["p_observed"] == 1.0


def test_kappa_sf_determinism_and_plan(spark):
    a = _one(spark, SF)
    assert a == _one(spark, SF)
    assert a["kappa"] is None or -1.0 <= a["kappa"] <= 1.0
    assert a["observed_agree"] <= a["n_docs"]
    from tests.test_plans import plan_of

    plan = plan_of(kappa_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
