"""X122 Wald-Wolfowitz runs test (queries.runs_test_report): exact
python mirror over planted daily series, perfectly-alternating series
maximal runs z>0, two-block regime z<0, median ties dropped, one-sided
degenerate NULL guard, determinism + run-count bound invariants, plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_RUNS_TEST)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import runs_test_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _med2(vals):
    v = sorted(vals)
    n = len(v)
    return v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        m2 = _med2(cs)
        ss = [1 if 2 * c > m2 else -1 for c in cs if 2 * c != m2]
        n1 = sum(1 for s in ss if s == 1)
        n2 = sum(1 for s in ss if s == -1)
        runs = sum(
            1 for i, s in enumerate(ss) if i == 0 or ss[i - 1] != s
        )
        ok = n1 > 0 and n2 > 0 and n1 + n2 > 1
        er = 1.0 + 2.0 * n1 * n2 / (n1 + n2) if ok else None
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
            if ok
            else 0.0
        )
        out.append(
            dict(
                event_type=ty,
                med2=m2,
                n_above=n1,
                n_below=n2,
                n_runs=runs,
                e_runs=round(er, 6) if ok else None,
                z=round((runs - er) / math.sqrt(var), 6)
                if ok and var > 0
                else None,
            )
        )
    return out


def _write(series):
    tmp = tempfile.mkdtemp()
    recs = []
    eid = 0
    for ty, cs in series.items():
        for d, c in enumerate(cs):
            for i in range(c):
                recs.append(
                    dict(
                        event_id=eid,
                        ts=pd.Timestamp((EPOCH0 + d) * DAY_US + i * 1_000_000,
                                        unit="us"),
                        user_id=eid % 5,
                        event_type=ty,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in runs_test_report(spark, sf).collect()]


def test_runs_alternating_max_runs(spark):
    # 1,9,1,9,...: every day flips sign -> runs = n, z strongly positive
    series = {"view": [1, 9] * 6}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["n_runs"] == 12 and r["n_above"] == r["n_below"] == 6
    assert r["z"] > 3


def test_runs_two_block_regime(spark):
    # low half then high half: exactly 2 runs, z strongly negative
    series = {"view": [1] * 6 + [9] * 6}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["n_runs"] == 2 and r["z"] < -3


def test_runs_median_ties_dropped(spark):
    # median value 5 appears 4 times and is dropped; 8 surviving days
    series = {"view": [1, 5, 9, 5, 1, 5, 9, 5, 1, 9, 1, 9]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["n_above"] + r["n_below"] == 8
    assert r["med2"] == 10


def test_runs_one_sided_null(spark):
    # all days equal except one spike: below-median side empty after ties
    # drop -> degenerate, z NULL
    series = {"view": [5, 5, 5, 5, 9]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["z"] is None and got[0]["n_below"] == 0


def test_runs_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert 1 <= r["n_runs"] <= r["n_above"] + r["n_below"]
    from tests.test_plans import plan_of

    plan = plan_of(runs_test_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
