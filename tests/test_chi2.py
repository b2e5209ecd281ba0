"""X96 chi-square independence + Cramér's V (queries.chi2_report):
hand-computed python mirror on planted contingency tables (including
zero-observed grid cells), independence -> chi2 ~0 / V ~0, perfect
association -> V = 1, determinism, plan pins. DuckDB value identity is
the oracle gate's job (ORACLE_CHI2)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import chi2_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, n_chars)] -> dict of the report row."""
    cells = Counter((s, min(n // 200, 9)) for s, n in rows)
    srcs = sorted({s for s, _ in cells})
    bks = sorted({b for _, b in cells})
    n = sum(cells.values())
    r = Counter()
    c = Counter()
    for (s, b), o in cells.items():
        r[s] += o
        c[b] += o
    chi2_nano, terms = 0, {}
    for s in srcs:
        for b in bks:
            o = cells.get((s, b), 0)
            d = o * n - r[s] * c[b]
            den = float(n) * float(r[s]) * float(c[b])
            tn = round(float(d) * float(d) / den * 1e9) if den else 0
            terms[(s, b)] = tn
            chi2_nano += tn
    top = max(terms.items(), key=lambda kv: (kv[1], kv[0]))
    mind = min(len(srcs) - 1, len(bks) - 1)
    chi2 = round(chi2_nano / 1e9, 6)
    v = (
        round(math.sqrt(chi2_nano / 1e9 / (n * mind)), 6)
        if n > 0 and mind > 0
        else None
    )
    return dict(
        n_total=n,
        n_sources=len(srcs),
        n_buckets=len(bks),
        dof=(len(srcs) - 1) * (len(bks) - 1),
        chi2_nano=chi2_nano,
        chi2=chi2,
        cramers_v=v,
        top_source=top[0][0],
        top_bucket=top[0][1],
        top_term_nano=top[1],
    )


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["w" * n for _, n in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [n for _, n in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return chi2_report(spark, sf).collect()[0].asDict()


def test_chi2_planted_mirror_with_zero_cells(spark):
    # srcA never emits bucket-2 docs -> a zero-observed grid cell that
    # must still contribute E = R*C/N to the statistic
    rows = (
        [("srcA", 50)] * 6
        + [("srcA", 250)] * 4
        + [("srcB", 50)] * 2
        + [("srcB", 250)] * 3
        + [("srcB", 450)] * 5
    )
    assert _collect(spark, _write(rows)) == _mirror(rows)


def test_chi2_independence_and_perfect_association(spark):
    # identical bucket mix per source -> chi2 exactly 0, V = 0
    rows = [(s, n) for s in ("srcA", "srcB") for n in [50] * 3 + [250] * 3]
    got = _collect(spark, _write(rows))
    assert got["chi2_nano"] == 0 and got["cramers_v"] == 0.0
    # each source owns one bucket exclusively -> V exactly 1
    rows = [("srcA", 50)] * 5 + [("srcB", 250)] * 5
    got = _collect(spark, _write(rows))
    assert got["cramers_v"] == 1.0 and got["dof"] == 1


def test_chi2_single_source_degenerate(spark):
    rows = [("only", 50)] * 3 + [("only", 250)] * 2
    got = _collect(spark, _write(rows))
    assert got["n_sources"] == 1 and got["dof"] == 0
    assert got["chi2_nano"] == 0 and got["cramers_v"] is None


def test_chi2_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF) == _mirror(
        [
            (r.source, int(r.n_chars))
            for r in pd.read_parquet(
                f"{SF}/documents.parquet", columns=["source", "n_chars"]
            ).itertuples()
        ]
    )
    from tests.test_plans import plan_of

    plan = plan_of(chi2_report(spark, SF))
    # one scan collapses map-side to the cell frame; everything after
    # (grid, margins, nano terms, 1-row agg) rides tiny frames
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
