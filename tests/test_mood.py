"""X138 Mood's median test (queries.mood_median_report): exact python
mirror over planted per-source length sets, identical sources chi2~0,
shifted source dominates the statistic, ties-at-median counted below
(scipy default), one-sided degenerate NULL guard, partition invariants,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_MOOD_MEDIAN)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import mood_median_report

SF = "/root/testdata/sf0.001"


def _mirror(groups):
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    med2 = pooled[(n + 1) // 2 - 1] + pooled[(n + 2) // 2 - 1]
    src = {}
    for s, vs in groups.items():
        oa = sum(1 for v in vs if 2 * v > med2)
        src[s] = (oa, len(vs) - oa)
    ta = sum(a for a, _ in src.values())
    tb = sum(b for _, b in src.values())
    k = len(src)
    rows = []
    for s in sorted(src):
        oa, ob = src[s]
        ns = oa + ob
        nn = ta + tb
        if ta > 0 and tb > 0:
            da = float(oa * nn - ns * ta)
            db = float(ob * nn - ns * tb)
            term = round(
                (
                    da * da / (float(nn) * float(ns) * float(ta))
                    + db * db / (float(nn) * float(ns) * float(tb))
                )
                * 1e9
            )
        else:
            term = None
        rows.append(
            dict(
                source=s,
                med2=med2,
                n_above=oa,
                n_below=ob,
                expected_above=round(ns * ta / nn, 6) if nn else None,
                term_nano=term,
                n_sources=k,
                n_total=nn,
            )
        )
    terms = [r["term_nano"] for r in rows if r["term_nano"] is not None]
    chi2 = round(sum(terms) / 1e9, 6) if terms else None
    for r in rows:
        r.update(chi2=chi2, df=k - 1)
    return rows


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
    return [r.asDict() for r in mood_median_report(spark, sf).collect()]


def test_mood_identical_sources_chi2_zero(spark):
    vs = [10, 20, 30, 40, 50, 60]
    groups = {"a": list(vs), "b": list(vs)}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    assert got[0]["chi2"] == 0.0


def test_mood_shifted_source_dominates(spark):
    groups = {
        "a": [10, 12, 14, 16, 18, 20],
        "b": [11, 13, 15, 17, 19, 21],
        "c": [100, 102, 104, 106, 108, 110],
    }
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    by = {r["source"]: r for r in got}
    assert by["c"]["n_above"] == 6 and by["c"]["n_below"] == 0
    assert by["c"]["term_nano"] > by["a"]["term_nano"]
    assert got[0]["chi2"] > 5.991


def test_mood_ties_counted_below(spark):
    # all of b sits exactly on the median value: ties='below'
    groups = {"a": [1, 2, 9, 10], "b": [5, 5, 5, 5]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    by = {r["source"]: r for r in got}
    assert by["b"]["n_above"] == 0 and by["b"]["n_below"] == 4
    assert got[0]["med2"] == 10


def test_mood_one_sided_null(spark):
    # every doc equal: all mass 'below' -> ta = 0 -> chi2 NULL
    groups = {"a": [5, 5, 5], "b": [5, 5]}
    got = _collect(spark, _write(groups))
    assert got == _mirror(groups)
    assert all(r["chi2"] is None and r["term_nano"] is None for r in got)


def test_mood_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 2
    r0 = a[0]
    assert all(r["chi2"] == r0["chi2"] and r["df"] == r0["df"] for r in a)
    assert sum(r["n_above"] + r["n_below"] for r in a) == r0["n_total"]
    from tests.test_plans import plan_of

    plan = plan_of(mood_median_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
