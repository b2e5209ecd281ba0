"""X146 Tukey-fences outlier audit (queries.tukey_fences_report): exact
python mirror over planted per-source length sets, type-1 quartiles
pinned on odd/even/tied populations, closed-form fence counts, no-IQR
degenerate (q1=q3) flags only far points, determinism + plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_TUKEY_FENCES)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import tukey_fences_report

SF = "/root/testdata/sf0.001"


def _q(vals, k):
    # type-1: smallest value whose cumulative population >= ceil(k*n/4)
    n = len(vals)
    r = math.ceil(k * n / 4.0)
    return sorted(vals)[r - 1]


def _mirror(groups):
    out = []
    for s in sorted(groups):
        vs = groups[s]
        q1, q3 = _q(vs, 1), _q(vs, 3)
        iqr = q3 - q1
        nlo = sum(1 for v in vs if 2 * v < 2 * q1 - 3 * iqr)
        nhi = sum(1 for v in vs if 2 * v > 2 * q3 + 3 * iqr)
        out.append(
            dict(
                source=s,
                n_docs=len(vs),
                min_chars=min(vs),
                q1=q1,
                q3=q3,
                max_chars=max(vs),
                iqr=iqr,
                n_low_outliers=nlo,
                n_high_outliers=nhi,
                outlier_share=round((nlo + nhi) / len(vs), 6),
            )
        )
    return out


def _write(groups):
    tmp = tempfile.mkdtemp()
    recs = []
    i = 0
    for s, vs in groups.items():
        for v in vs:
            recs.append(
                dict(doc_id=i, text="x" * v, lang="en", source=s, n_chars=v)
            )
            i += 1
    pd.DataFrame(recs).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in tukey_fences_report(spark, sf).collect()]


def test_tukey_quartiles_type1(spark):
    # n=8: ceil(8/4)=2 -> 2nd smallest; ceil(24/4)=6 -> 6th smallest
    groups = {"a": [10, 20, 30, 40, 50, 60, 70, 80]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    r = got[0]
    assert r["q1"] == 20 and r["q3"] == 60 and r["iqr"] == 40


def test_tukey_outlier_counts_closed_form(spark):
    # q1=20 q3=60 iqr=40: fences at 20-60=-40 and 60+60=120;
    # 500 is the only point outside
    groups = {"a": [10, 20, 30, 40, 50, 60, 70, 500]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    r = got[0]
    assert r["n_high_outliers"] == 1 and r["n_low_outliers"] == 0
    assert r["outlier_share"] == round(1 / 8, 6)


def test_tukey_degenerate_iqr(spark):
    # mass concentrated at one value: q1=q3, iqr=0, fences collapse to
    # the point - everything off it is an outlier
    groups = {"a": [50] * 10 + [49, 51, 200]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    r = got[0]
    assert r["iqr"] == 0
    assert r["n_low_outliers"] == 1 and r["n_high_outliers"] == 2


def test_tukey_multi_source_isolation(spark):
    groups = {"a": [10, 20, 30, 40], "b": [1000, 2000, 3000, 4000]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    # each source judged against its own fences: no cross-contamination
    assert all(r["outlier_share"] == 0.0 for r in got)


def test_tukey_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 2
    for r in a:
        assert r["min_chars"] <= r["q1"] <= r["q3"] <= r["max_chars"]
        assert 0.0 <= r["outlier_share"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(tukey_fences_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
