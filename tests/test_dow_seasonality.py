"""X133 day-of-week seasonal decomposition (queries.
dow_seasonality_report): exact micro-mirror over planted daily series,
pure weekly pattern strength=1 with zero residual sum, constant series
NULL strength, calendar alignment of the (d+3)%7 Monday convention,
seasonal components sum to ~0, determinism + plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_DOW_SEASONALITY)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import dow_seasonality_report

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
        by = {}
        for i, c in enumerate(cs):
            by.setdefault((EPOCH0 + i + 3) % 7, []).append(c)
        ssr = ssd = 0
        for i, c in enumerate(cs):
            d = (EPOCH0 + i + 3) % 7
            nd, sd = len(by[d]), sum(by[d])
            r = (c * nd - sd) / nd
            ssr += round(r * r * 1e6)
            dv = (c * n - s) / n
            ssd += round(dv * dv * 1e6)
        for d in sorted(by):
            nd, sd = len(by[d]), sum(by[d])
            out.append(
                dict(
                    event_type=ty,
                    dow=d,
                    n_days_dow=nd,
                    sum_dow=sd,
                    dow_mean=round(sd / nd, 6),
                    seasonal=round(sd / nd - s / n, 6),
                    ssr_micro=ssr,
                    ssd_micro=ssd,
                    strength=round(max(0.0, 1.0 - ssr / ssd), 6)
                    if ssd > 0
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
    return [r.asDict() for r in dow_seasonality_report(spark, sf).collect()]


def test_dow_pure_weekly_strength_one(spark):
    # exact period-7 pattern over 4 full weeks: residuals identically 0
    week = [3, 9, 4, 11, 2, 8, 6]
    series = {"view": week * 4}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert all(r["ssr_micro"] == 0 and r["strength"] == 1.0 for r in got)
    assert len(got) == 7 and all(r["n_days_dow"] == 4 for r in got)


def test_dow_constant_null_strength(spark):
    series = {"view": [5] * 28}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert all(r["strength"] is None and r["seasonal"] == 0.0 for r in got)


def test_dow_monday_alignment(spark):
    # EPOCH0+2 is a Monday under (d+3)%7==0: spikes at offsets 2,9,16,23
    # must surface as the dow=0 seasonal peak
    cs = [1] * 28
    for i in (2, 9, 16, 23):
        cs[i] = 50
    series = {"view": cs}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    best = max(got, key=lambda r: r["seasonal"])
    assert best["dow"] == 0 and best["dow_mean"] == 50.0


def test_dow_seasonal_components_balance(spark):
    # weighted by day counts, seasonal components must cancel exactly
    series = {"view": [4, 7, 1, 9, 3, 12, 5, 8] * 3}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    tot = sum(r["seasonal"] * r["n_days_dow"] for r in got)
    assert abs(tot) < 1e-4


def test_dow_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 14 and len(a) % 7 == 0
    for r in a:
        assert r["strength"] is None or 0.0 <= r["strength"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(dow_seasonality_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
