"""X111 one-way ANOVA F (queries.anova_report): exact-fraction python
mirror, separated groups give a huge F, identical groups give F=0,
constant-within-groups gives SSW=0 NULL guard, single group NULL,
scipy-identity spot value, determinism + SS-partition invariant, plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_ANOVA)."""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import anova_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, v)] -> report dicts by source."""
    g = defaultdict(lambda: [0, 0, 0])
    for s, v in rows:
        c = g[s]
        c[0] += 1
        c[1] += v
        c[2] += v * v
    nt = sum(c[0] for c in g.values())
    st = sum(c[1] for c in g.values())
    qt = sum(c[2] for c in g.values())
    k = len(g)
    sb = sum(c[1] * c[1] / c[0] for _, c in sorted(g.items()))
    ssb = sb - st * st / nt
    ssw = qt - sb
    sst = qt - st * st / nt
    f = (
        round((ssb / (k - 1)) / (ssw / (nt - k)), 6)
        if k > 1 and nt > k and ssw > 0
        else None
    )
    eta = round(ssb / sst, 6) if sst > 0 else None
    return [
        dict(
            source=s,
            n_docs=c[0],
            sum_v=c[1],
            sum_v2=c[2],
            mean_v=round(c[1] / c[0], 6),
            n_groups=k,
            ss_between=round(ssb, 6),
            ss_within=round(ssw, 6),
            f_stat=f,
            eta_sq=eta,
        )
        for s, c in sorted(g.items())
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
    return [r.asDict() for r in anova_report(spark, sf).collect()]


def test_anova_separated_groups(spark):
    # group means 10 vs 1000 with tiny within-variance: F is enormous
    rows = [("a", 9), ("a", 10), ("a", 11), ("b", 999), ("b", 1000), ("b", 1001)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["f_stat"] > 100_000


def test_anova_identical_groups_f_zero(spark):
    # same values in every group: SSB = 0 exactly -> F = 0
    rows = [("a", 5), ("a", 7), ("b", 5), ("b", 7), ("c", 5), ("c", 7)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["ss_between"] == 0.0 and r["f_stat"] == 0.0 for r in got)


def test_anova_zero_within_null_guard(spark):
    # each group constant: SSW = 0 -> F NULL (infinite separation)
    rows = [("a", 10), ("a", 10), ("b", 20), ("b", 20)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["f_stat"] is None for r in got)
    assert all(r["eta_sq"] == 1.0 for r in got)


def test_anova_single_group_null(spark):
    rows = [("a", 1), ("a", 2), ("a", 3)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["f_stat"] is None and got[0]["ss_between"] == 0.0


def test_anova_scipy_identity(spark):
    # hand-checked against scipy.stats.f_oneway([1,2,3,4],[3,4,5,6],[5,6,7,8]):
    # SSB=32, SSW=15, k=3, N=12 -> F = (32/2)/(15/9) = 9.6 exactly
    rows = (
        [("a", v) for v in (1, 2, 3, 4)]
        + [("b", v) for v in (3, 4, 5, 6)]
        + [("c", v) for v in (5, 6, 7, 8)]
    )
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["ss_between"] == 32.0 and got[0]["ss_within"] == 15.0
    assert got[0]["f_stat"] == 9.6


def test_anova_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    # SS partition: SSB + SSW = SST >= 0, eta in [0, 1]
    r0 = a[0]
    assert r0["ss_between"] >= 0 and r0["ss_within"] >= 0
    assert all(0.0 <= r["eta_sq"] <= 1.0 for r in a)
    assert all(r["n_groups"] == len(a) for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(anova_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
