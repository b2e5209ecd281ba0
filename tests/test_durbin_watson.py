"""X127 Durbin-Watson residual autocorrelation (queries.
durbin_watson_report): exact-micro python mirror, perfect line zero-SSE
NULL guard, alternating residuals d→4, slow-regime residuals d→0,
white-ish residuals d≈2, determinism + micro-sum invariants, plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_DURBIN_WATSON)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import durbin_watson_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        ys = list(series[ty]) + [0] * (span - len(series[ty]))
        n = len(ys)
        xs = list(range(1, n + 1))
        sx, sy = sum(xs), sum(ys)
        sxx = n * sum(x * x for x in xs) - sx * sx
        sxy = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
        if sxx <= 0:
            continue
        b = sxy / sxx
        a = (sy - b * sx) / n
        es = [y - (a + b * x) for x, y in zip(xs, ys)]
        e2 = sum(round(e * e * 1e6) for e in es)
        d2 = sum(
            round((es[i] - es[i - 1]) ** 2 * 1e6) for i in range(1, len(es))
        )
        out.append(
            dict(
                event_type=ty,
                n_days=n,
                sse_micro=e2,
                ssd_micro=d2,
                dw=round(d2 / e2, 6) if e2 > 0 else None,
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
    return [r.asDict() for r in durbin_watson_report(spark, sf).collect()]


def test_dw_perfect_line_null(spark):
    # exact line: all residuals 0 -> SSE 0 -> dw NULL
    series = {"view": [3 * x + 2 for x in range(1, 9)]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["sse_micro"] == 0 and got[0]["dw"] is None


def test_dw_alternating_near_four(spark):
    # flat trend + alternating noise: e flips sign daily -> d -> 4
    series = {"view": [10, 14] * 8}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["dw"] > 3.5


def test_dw_slow_regime_near_zero(spark):
    # half low, half high: the line undershoots each block's mean in the
    # same direction for long stretches -> consecutive residuals agree,
    # d well below 2
    series = {"view": [2] * 12 + [20] * 12}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["dw"] < 1.0


def test_dw_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert r["sse_micro"] >= 0 and r["ssd_micro"] >= 0
        assert r["dw"] is None or 0.0 <= r["dw"] <= 4.000001
    from tests.test_plans import plan_of

    plan = plan_of(durbin_watson_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
