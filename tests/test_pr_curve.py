"""X102 PR curve + average precision (queries.pr_curve_report):
sklearn-semantics brute-force mirror (descending-threshold sweep, step
AP), perfect-separation AP=1, reversed-scorer worst case, no-positives
NULL guard, determinism, plan pins. DuckDB value identity is the oracle
gate's job (ORACLE_PR_CURVE)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import pr_curve_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(score, y)] -> report dicts ordered by score asc."""
    agg: dict[int, list[int]] = {}
    for s, y in rows:
        c = agg.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    p_tot = sum(v[1] for v in agg.values())
    out = []
    tp = fp = 0
    ap_nano = 0
    rows_desc = []
    for s in sorted(agg, reverse=True):
        n, pos = agg[s]
        dtp = pos
        tp += pos
        fp += n - pos
        term = round(1e9 * dtp * tp / (tp + fp)) if tp + fp > 0 else 0
        ap_nano += term
        rows_desc.append((s, tp, fp))
    ap = round(ap_nano / (1e9 * p_tot), 6) if p_tot > 0 else None
    for s, tp, fp in rows_desc:
        fn = p_tot - tp
        out.append(
            dict(
                score=s,
                tp=tp,
                fp=fp,
                fn=fn,
                precision=round(tp / (tp + fp), 6) if tp + fp > 0 else None,
                recall=round(tp / p_tot, 6) if p_tot > 0 else None,
                f1=round(2 * tp / (2 * tp + fp + fn), 6)
                if 2 * tp + fp + fn > 0
                else None,
                ap=ap,
            )
        )
    return sorted(out, key=lambda r: r["score"])


def _write(score_rows):
    tmp = tempfile.mkdtemp()
    texts, langs = [], []
    for s, y in score_rows:
        texts.append(" ".join(["the"] * s + ["zzz"] * (1000 - s)))
        langs.append("en" if y else "de")
    pd.DataFrame(
        {
            "doc_id": range(len(score_rows)),
            "text": texts,
            "lang": langs,
            "source": "src0",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in pr_curve_report(spark, sf).collect()]


def test_pr_perfect_separation(spark):
    rows = [(800, 1)] * 5 + [(100, 0)] * 10
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {r["score"]: r for r in got}
    assert by[800]["precision"] == 1.0 and by[800]["recall"] == 1.0
    assert by[800]["ap"] == 1.0  # all positives rank strictly first


def test_pr_reversed_scorer(spark):
    # positives get the LOWEST scores: AP = sum over positives of
    # p/(n_neg + p)/P — the random-ranking floor shape
    rows = [(100, 1)] * 4 + [(900, 0)] * 6
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["ap"] == 0.4  # 4/(6+4)


def test_pr_mixed_and_f1(spark):
    rows = [(700, 1)] * 3 + [(700, 0)] * 1 + [(400, 1)] * 2 + [(400, 0)] * 4 + [
        (100, 0)
    ] * 5
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)


def test_pr_no_positives_null(spark):
    rows = [(500, 0)] * 6
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["ap"] is None and got[0]["recall"] is None


def test_pr_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    # recall must be non-decreasing as the threshold drops (score asc ->
    # recall desc); tp+fn constant
    recalls = [r["recall"] for r in a]
    assert recalls == sorted(recalls, reverse=True)
    assert len({r["tp"] + r["fn"] for r in a}) == 1
    assert len({r["ap"] for r in a}) == 1
    from tests.test_plans import plan_of

    plan = plan_of(pr_curve_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
