"""X129 two-sample Cramér-von Mises (queries.cvm_test_report): exact
python mirror over planted length distributions, identical samples T=0,
fully-separated samples reject, broad-dispersion drift that KS underweights,
one-sided degenerate NULL guard, determinism + plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_CVM_TEST)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import cvm_test_report

SF = "/root/testdata/sf0.001"


def _mirror(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    vals = sorted(set(a_vals) | set(b_vals))
    cuma = cumb = 0
    s = 0
    for v in vals:
        ca = a_vals.count(v)
        cb = b_vals.count(v)
        cuma += ca
        cumb += cb
        diff = cuma * nb - cumb * na
        s += (ca + cb) * diff * diff
    ok = na * nb != 0
    t = s / (na * nb * (na + nb) ** 2) if ok else None
    return dict(
        n_a=na,
        n_b=nb,
        n_vals=len(vals),
        s_exact=str(s),
        t_stat=round(t, 6) if ok else None,
        reject_h0=(1 if t > 0.461 else 0) if ok else None,
    )


def _write(a_vals, b_vals):
    tmp = tempfile.mkdtemp()
    recs = []
    for i, v in enumerate(a_vals):
        recs.append(
            dict(doc_id=i, text="x", lang="en", source="s0", n_chars=v)
        )
    for j, v in enumerate(b_vals):
        recs.append(
            dict(
                doc_id=len(a_vals) + j,
                text="x",
                lang="es",
                source="s0",
                n_chars=v,
            )
        )
    pd.DataFrame(recs).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in cvm_test_report(spark, sf).collect()]


def test_cvm_identical_zero(spark):
    a = [10, 20, 30, 40] * 3
    got = _collect(spark, _write(a, list(a)))
    assert got == [_mirror(a, list(a))]
    assert got[0]["s_exact"] == "0" and got[0]["t_stat"] == 0.0
    assert got[0]["reject_h0"] == 0


def test_cvm_fully_separated_rejects(spark):
    a = list(range(10, 22))
    b = list(range(100, 112))
    got = _collect(spark, _write(a, b))
    assert got == [_mirror(a, b)]
    # full separation maximizes the integrated gap: T well past 0.461
    assert got[0]["reject_h0"] == 1 and got[0]["t_stat"] > 1.0


def test_cvm_dispersion_drift_accumulates(spark):
    # same median, b twice the spread: every off-center value carries a
    # gap — the integrated statistic sees what the single KS sup
    # underweights. Exact mirror identity is the real assertion.
    a = [50] * 4 + [49, 51] * 4
    b = [10, 30, 50, 70, 90] * 3
    got = _collect(spark, _write(a, b))
    assert got == [_mirror(a, b)]
    assert got[0]["t_stat"] > 0


def test_cvm_one_sided_null(spark):
    a = [10, 20, 30]
    got = _collect(spark, _write(a, []))
    assert got == [_mirror(a, [])]
    r = got[0]
    assert r["n_b"] == 0 and r["t_stat"] is None and r["reject_h0"] is None


def test_cvm_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 1 and a[0]["n_a"] > 0 and a[0]["n_b"] > 0
    assert int(a[0]["s_exact"]) > 0
    from tests.test_plans import plan_of

    plan = plan_of(cvm_test_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
