"""X120 Brown-Forsythe variance homogeneity (queries.levene_report):
exact-integer python mirror with its own median, scipy-identity check on
a hand-done case, equal-spread groups W=0, spread-differing groups W
large, even-n two-middle median, zero-deviation NULL guard, determinism
+ invariants, plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_LEVENE)."""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import levene_report

SF = "/root/testdata/sf0.001"


def _med2(vals):
    v = sorted(vals)
    n = len(v)
    return v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]


def _mirror(rows):
    g = defaultdict(list)
    for s, v in rows:
        g[s].append(v)
    stats = {}
    for s, vals in g.items():
        m2 = _med2(vals)
        z = [abs(2 * v - m2) for v in vals]
        stats[s] = (len(vals), m2, sum(z), sum(x * x for x in z))
    nt = sum(c[0] for c in stats.values())
    st = sum(c[2] for c in stats.values())
    qt = sum(c[3] for c in stats.values())
    k = len(stats)
    sb = sum(c[2] * c[2] / c[0] for _, c in sorted(stats.items()))
    ssb = sb - st * st / nt
    ssw = qt - sb
    w = (
        round((ssb / (k - 1)) / (ssw / (nt - k)), 6)
        if k > 1 and nt > k and ssw > 0
        else None
    )
    return [
        dict(
            source=s,
            n_docs=c[0],
            med2=c[1],
            sum_z=c[2],
            sum_z2=c[3],
            mean_absdev=round(c[2] / (2 * c[0]), 6),
            n_groups=k,
            w_stat=w,
        )
        for s, c in sorted(stats.items())
    ]


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x" * v for _, v in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [v for _, v in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in levene_report(spark, sf).collect()]


def test_levene_equal_spread_w_zero(spark):
    # both groups have identical |dev-from-median| multisets: W = 0
    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 110), ("b", 120), ("b", 130)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["w_stat"] == 0.0 for r in got)


def test_levene_spread_differs_w_large(spark):
    # a tight around 100, b wild: W blows up
    rows = [("a", 99), ("a", 100), ("a", 101)] * 3 + [
        ("b", 10),
        ("b", 100),
        ("b", 500),
        ("b", 20),
        ("b", 400),
        ("b", 90),
        ("b", 95),
        ("b", 300),
        ("b", 250),
    ]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["w_stat"] > 5  # ~8.5; F crit at (1, 16) dof ~ 4.5


def test_levene_even_n_two_middle_median(spark):
    # 4 values: med2 = v2 + v3 (both middles), scipy's true median x2
    rows = [("a", 1), ("a", 3), ("a", 7), ("a", 15), ("b", 2), ("b", 4)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {r["source"]: r for r in got}
    assert by["a"]["med2"] == 10 and by["b"]["med2"] == 6


def test_levene_zero_deviation_null(spark):
    # every group constant: all z = 0 -> SSW = 0 -> W NULL
    rows = [("a", 5)] * 3 + [("b", 9)] * 3
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["w_stat"] is None and r["sum_z"] == 0 for r in got)


def test_levene_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    for r in a:
        assert r["sum_z"] >= 0 and r["sum_z2"] >= 0
        assert r["n_groups"] == len(a)
    from tests.test_plans import plan_of

    plan = plan_of(levene_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
