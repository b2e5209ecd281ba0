"""X103 Brier + Murphy decomposition (queries.brier_report):
exact-fraction mirror, perfect-calibration (REL=0), constant-forecast
(RES=0), decomposition identity, determinism, plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_BRIER)."""

from __future__ import annotations

import os
import tempfile
from fractions import Fraction

import pandas as pd

from ocr_output_evaluation_spark.queries import brier_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(score 0..1000, y)] -> 1-row report dict."""
    agg: dict[int, list[int]] = {}
    for s, y in rows:
        c = agg.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    nt = sum(v[0] for v in agg.values())
    pt = sum(v[1] for v in agg.values())
    bsum = sum(
        n * s * s - 2000 * s * pos + 1_000_000 * pos for s, (n, pos) in agg.items()
    )
    reln = sum(
        round(1e9 * float(s * n - 1000 * pos) ** 2 / (1e6 * n))
        for s, (n, pos) in agg.items()
    )
    obar = pt / nt
    resn = sum(
        round(1e9 * n * (pos / n - obar) ** 2) for _, (n, pos) in agg.items()
    )
    brier = bsum / (nt * 1e6)
    rel = reln / (1e9 * nt)
    res = resn / (1e9 * nt)
    unc = obar * (1 - obar)
    return dict(
        n_docs=nt,
        n_bins=len(agg),
        base_rate=round(obar, 6),
        brier=round(brier, 6),
        reliability=round(rel, 6),
        resolution=round(res, 6),
        uncertainty=round(unc, 6),
        decomp_gap=round(brier - (rel - res + unc), 6),
    )


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


def _one(spark, sf):
    rows = brier_report(spark, sf).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_brier_perfect_calibration(spark):
    # each bin's observed rate equals its forecast -> REL == 0 and
    # Brier == UNC - RES exactly (gap 0 up to nano rounding)
    rows = [(500, 1)] * 1 + [(500, 0)] * 1 + [(250, 1)] * 1 + [(250, 0)] * 3
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["reliability"] == 0.0
    assert abs(got["decomp_gap"]) <= 2e-6


def test_brier_constant_forecast_no_resolution(spark):
    rows = [(300, 1)] * 3 + [(300, 0)] * 7
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["resolution"] == 0.0  # single bin == base rate
    # exact Brier: mean of (0.3-1)^2 x3 and (0.3-0)^2 x7
    exact = Fraction(3) * Fraction(7, 10) ** 2 + Fraction(7) * Fraction(3, 10) ** 2
    assert got["brier"] == round(float(exact / 10), 6)


def test_brier_oracle_forecast_zero(spark):
    # forecast 1000 for all-en and 0 for all-de -> Brier == 0
    rows = [(1000, 1)] * 4 + [(0, 0)] * 6
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["brier"] == 0.0 and got["reliability"] == 0.0
    assert got["resolution"] == got["uncertainty"]


def test_brier_sf_determinism_and_plan(spark):
    a = _one(spark, SF)
    assert a == _one(spark, SF)
    assert 0.0 <= a["brier"] <= 1.0
    assert a["reliability"] >= 0.0 and a["resolution"] >= 0.0
    assert 0.0 <= a["uncertainty"] <= 0.25
    assert abs(a["decomp_gap"]) <= 2e-6
    from tests.test_plans import plan_of

    plan = plan_of(brier_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
