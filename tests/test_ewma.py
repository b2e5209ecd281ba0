"""X132 EWMA control chart (queries.ewma_chart_report): exact python
mirror over planted daily series (same integer tap/moment arithmetic),
constant series never alarms, sustained step shift alarms after the
shift, smoothing delays the single-spike response vs the raw series,
32-tap truncation window, determinism + plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_EWMA_CHART)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _EWMA_W, ewma_chart_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        n = len(cs)
        s = sum(cs)
        q = sum(c * c for c in cs)
        alarms = []
        for i in range(n):
            a = b = 0
            for j, w in enumerate(_EWMA_W):
                if i - j >= 0:
                    a += w * cs[i - j]
                    b += w
            d = a * n - s * b
            if float(d) * float(d) > float(n * q - s * s) * float(b) * float(b):
                alarms.append(i)
            if i == n - 1:
                last = (a, b)
        out.append(
            dict(
                event_type=ty,
                n_days=n,
                mu=round(s / n, 6),
                sigma=round(((n * q - s * s) / (n * n)) ** 0.5, 6),
                z_last_num=last[0],
                z_last_den=last[1],
                z_last=round(last[0] / last[1], 6),
                n_alarms=len(alarms),
                first_alarm_day=EPOCH0 + alarms[0] if alarms else None,
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
                        ts=pd.Timestamp(
                            (EPOCH0 + d) * DAY_US + i * 1_000_000, unit="us"
                        ),
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
    return [r.asDict() for r in ewma_chart_report(spark, sf).collect()]


def test_ewma_constant_never_alarms(spark):
    series = {"view": [7] * 20}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["n_alarms"] == 0 and r["sigma"] == 0.0
    assert r["z_last"] == 7.0 and r["first_alarm_day"] is None


def test_ewma_step_shift_alarms_after_shift(spark):
    # 40 in-control days then a sustained tail shift (short relative to
    # the span, so whole-series sigma stays near the in-control value):
    # the smoothed level crosses mu + sigma inside the high regime
    series = {"view": [5] * 40 + [30] * 8}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["n_alarms"] > 0
    assert r["first_alarm_day"] >= EPOCH0 + 40


def test_ewma_smoothing_vs_spike(spark):
    # one huge spike in flat noise: the raw series leaves the band for
    # one day, the EWMA keeps the response bounded - mirror decides the
    # exact alarm set; invariant: alarms only on/after the spike day
    series = {"view": [5] * 10 + [200] + [5] * 10}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    if r["n_alarms"]:
        assert r["first_alarm_day"] >= EPOCH0 + 10


def test_ewma_truncation_window(spark):
    # 40 days: beyond 32 taps the early spike falls out of the window
    # entirely; z_last_den equals the full 32-tap weight sum
    series = {"view": [100] + [3] * 39}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["z_last_den"] == sum(_EWMA_W)


def test_ewma_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert r["z_last_den"] > 0 and 0 <= r["n_alarms"] <= r["n_days"]
    from tests.test_plans import plan_of

    plan = plan_of(ewma_chart_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
