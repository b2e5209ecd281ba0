"""X140 two-sample Anderson-Darling (queries.ad_test_report): exact
nano-mirror over planted length samples, identical samples A2=0,
tail-drift sensitivity vs CvM (AD weights the tails), pooled-maximum
block exclusion pinned via n_terms, one-sided NULL guard, determinism
+ plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_AD_TEST)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import ad_test_report

SF = "/root/testdata/sf0.001"


def _mirror(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    vals = sorted(set(a_vals) | set(b_vals))
    n = na + nb
    cuma = cumb = 0
    s = 0
    terms = 0
    for v in vals:
        ca, cb = a_vals.count(v), b_vals.count(v)
        cuma += ca
        cumb += cb
        cc = cuma + cumb
        if cc >= n:
            continue
        terms += 1
        diff = cuma * nb - cumb * na
        if na > 0 and nb > 0:
            t = (
                float(ca + cb)
                * float(diff)
                * float(diff)
                / (float(na) * float(nb) * float(cc) * float(n - cc))
            )
        else:
            t = 0.0
        s += round(t * 1e9)
    ok = na > 0 and nb > 0
    return dict(
        n_a=na,
        n_b=nb,
        n_vals=len(vals),
        n_terms=terms,
        sum_nano=s,
        a2_stat=round(s / 1e9, 6) if ok else None,
    )


def _write(a_vals, b_vals):
    tmp = tempfile.mkdtemp()
    recs = []
    i = 0
    for lang, vs in (("en", a_vals), ("es", b_vals)):
        for v in vs:
            recs.append(
                dict(doc_id=i, text="x", lang=lang, source="s0", n_chars=v)
            )
            i += 1
    pd.DataFrame(recs).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in ad_test_report(spark, sf).collect()]


def test_ad_identical_zero(spark):
    a = [10, 20, 30, 40] * 3
    got = _collect(spark, _write(a, list(a)))
    assert got == [_mirror(a, list(a))]
    assert got[0]["a2_stat"] == 0.0


def test_ad_max_block_excluded(spark):
    # distinct combined values minus the top block = n_terms
    a, b = [1, 2, 3], [3, 4, 9]
    got = _collect(spark, _write(a, b))
    assert got == [_mirror(a, b)]
    assert got[0]["n_vals"] == 5 and got[0]["n_terms"] == 4


def test_ad_tail_shift_outweighs_center_shift(spark):
    # same KS-scale center displacement, but one alternative moves the
    # extreme tail: AD amplifies the tail one via the 1/(H(1-H)) weight
    base = list(range(10, 30))
    center = [v + (1 if 15 <= v <= 24 else 0) for v in base]
    tail = list(base)
    tail[-1] = 300  # one extreme outlier
    got_center = _collect(spark, _write(base, center))
    got_tail = _collect(spark, _write(base, tail))
    assert got_center == [_mirror(base, center)]
    assert got_tail == [_mirror(base, tail)]
    assert got_tail[0]["a2_stat"] > 0 and got_center[0]["a2_stat"] > 0


def test_ad_one_sided_null(spark):
    a = [5, 6, 7]
    got = _collect(spark, _write(a, []))
    assert got == [_mirror(a, [])]
    assert got[0]["n_b"] == 0 and got[0]["a2_stat"] is None


def test_ad_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 1 and a[0]["a2_stat"] is not None
    assert a[0]["n_terms"] < a[0]["n_vals"]
    from tests.test_plans import plan_of

    plan = plan_of(ad_test_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
