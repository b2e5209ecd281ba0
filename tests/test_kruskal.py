"""X104 Kruskal-Wallis (queries.kruskal_report): scipy-semantics
brute-force mirror (average ranks, tie correction), identical-groups
H≈0, separated-groups near-max H, all-tied NULL guard, determinism,
plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_KRUSKAL)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import kruskal_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, value)] -> report dicts by source."""
    vals = sorted(v for _, v in rows)
    cnt = Counter(vals)
    # average rank (x2) per distinct value
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        r2[v] = 2 * cum + c + 1
        cum += c
    by: dict[str, list[int]] = {}
    for s, v in rows:
        by.setdefault(s, []).append(v)
    n = len(rows)
    ssum = sum(
        (sum(r2[v] for v in vs) / 2) ** 2 / len(vs) for vs in by.values()
    )
    h = 12.0 / (n * (n + 1)) * ssum - 3.0 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    corr = 1.0 - ties / (n**3 - n)
    out = []
    for s in sorted(by):
        vs = by[s]
        rs2 = sum(r2[v] for v in vs)
        out.append(
            dict(
                source=s,
                n_docs=len(vs),
                rank_sum2=rs2,
                mean_rank=round(rs2 / (2 * len(vs)), 6),
                n_groups=len(by),
                h_stat=round(h, 6),
                h_tie_corrected=round(h / corr, 6) if corr > 0 else None,
            )
        )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x"] * len(rows),
            "lang": ["en"] * len(rows),
            "source": [s for s, _ in rows],
            "n_chars": [v for _, v in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in kruskal_report(spark, sf).collect()]


def test_kw_separated_groups(spark):
    # three fully separated groups: H == k-1 scaled near its max
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (10, 11, 12)] + [
        ("c", v) for v in (20, 21, 22)
    ]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["h_stat"] > 6.5  # chi2(2) 95% crit ~5.99


def test_kw_identical_groups(spark):
    rows = [(s, v) for s in ("a", "b", "c") for v in (5, 9, 9, 14)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["h_stat"] == 0.0
    assert {r["mean_rank"] for r in got} == {6.5}


def test_kw_all_tied_null(spark):
    rows = [(s, 7) for s in ("a", "b") for _ in range(4)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["h_tie_corrected"] is None  # corr == 0 guard


def test_kw_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    n = sum(r["n_docs"] for r in a)
    # rank sums partition the total: sum of rank_sum2 == n(n+1)
    assert sum(r["rank_sum2"] for r in a) == n * (n + 1)
    assert len({r["h_stat"] for r in a}) == 1
    assert a[0]["h_stat"] >= 0.0
    from tests.test_plans import plan_of

    plan = plan_of(kruskal_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
    assert "BroadcastHashJoin" in plan
