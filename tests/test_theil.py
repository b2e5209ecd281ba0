"""X119 Theil T inequality + decomposition (queries.theil_report):
exact-nano python mirror, equal lengths T=0, textbook two-value Theil
pinned to closed form, pure between-source inequality (within=0),
decomposition-gap bound, determinism + nonnegativity invariants, plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_THEIL)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import theil_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    sv = Counter(rows)
    ng = {}
    for (s, v), c in sv.items():
        d = ng.setdefault(s, [0, 0])
        d[0] += c
        d[1] += c * v
    nt = sum(d[0] for d in ng.values())
    st = sum(d[1] for d in ng.values())
    tw = Counter()
    tt = Counter()
    for (s, v), c in sv.items():
        n_g, s_g = ng[s]
        if v > 0:
            tw[s] += round(c * v / s_g * math.log(v * n_g / s_g) * 1e9)
            tt[s] += round(c * v / st * math.log(v * nt / st) * 1e9)
    out = []
    tbs = {}
    tww = {}
    for s, (n_g, s_g) in ng.items():
        tbs[s] = round(s_g / st * math.log(s_g * nt / (st * n_g)) * 1e9)
        tww[s] = round(s_g / st * tw[s])
    total = sum(tt.values())
    between = sum(tbs.values())
    within = sum(tww.values())
    for s in sorted(ng):
        n_g, s_g = ng[s]
        out.append(
            dict(
                source=s,
                n_docs=n_g,
                sum_v=s_g,
                theil_within_nano=tw[s],
                between_term_nano=tbs[s],
                theil_total_nano=total,
                theil_between_nano=between,
                theil_within_sum_nano=within,
                theil_total=round(total / 1e9, 6),
                decomp_gap=round((total - between - within) / 1e9, 6),
            )
        )
    return out


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
    return [r.asDict() for r in theil_report(spark, sf).collect()]


def test_theil_equal_lengths_zero(spark):
    rows = [("a", 100)] * 3 + [("b", 100)] * 5
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(
        r["theil_total_nano"] == 0
        and r["theil_within_nano"] == 0
        and r["theil_between_nano"] == 0
        for r in got
    )


def test_theil_two_value_closed_form(spark):
    # one source, half the docs at 100, half at 300: mu=200,
    # T = 0.5*(0.5)ln(0.5) + 0.5*(1.5)ln(1.5) exactly
    rows = [("a", 100)] * 4 + [("a", 300)] * 4
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    want = 0.5 * 0.5 * math.log(0.5) + 0.5 * 1.5 * math.log(1.5)
    assert abs(got[0]["theil_total"] - round(want, 6)) <= 1e-6
    assert got[0]["theil_between_nano"] == 0  # single source


def test_theil_pure_between(spark):
    # each source internally equal, but sources differ: within = 0,
    # total = between exactly (up to nano rounding)
    rows = [("a", 100)] * 4 + [("b", 300)] * 4
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    r = got[0]
    assert r["theil_within_sum_nano"] == 0
    assert abs(r["theil_total_nano"] - r["theil_between_nano"]) <= 4


def test_theil_sf_determinism_and_invariants(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    r = a[0]
    assert r["theil_total_nano"] >= 0 and r["theil_between_nano"] >= 0
    assert all(x["theil_within_nano"] >= -len(a) for x in a)
    # decomposition identity to nano noise: gap within ±(cells+sources) nanos
    assert abs(r["decomp_gap"]) < 1e-4
    from tests.test_plans import plan_of

    plan = plan_of(theil_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
