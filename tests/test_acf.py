"""X116 daily-volume ACF (queries.acf_report): exact-integer python
mirror over planted series, alternating series r_1 < 0 pinned exactly,
period-2 seasonality r_2 = 1 on the deviation-pure series, constant
series NULL guard (zero denominator), short-series lag truncation,
determinism + lag-0-excluded/bounds invariants, plan pins. DuckDB
value identity is the oracle gate's job (ORACLE_ACF)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _ACF_MAX_LAG, acf_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    """series: dict[type, list[count]] (day 0..len-1, all types padded to
    the union span by the caller) -> report dicts."""
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        D, T = len(cs), sum(cs)
        dev = [D * c - T for c in cs]
        den = sum(v * v for v in dev)
        for lag in range(1, _ACF_MAX_LAG + 1):
            if lag >= D:
                continue  # no pairs -> row absent
            num = sum(dev[i] * dev[i + lag] for i in range(D - lag))
            out.append(
                dict(
                    event_type=ty,
                    lag=lag,
                    n_days=D,
                    acf_num=num,
                    acf_den=den,
                    acf=round(num / den, 6) if den != 0 else None,
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
    return [r.asDict() for r in acf_report(spark, sf).collect()]


def test_acf_alternating_negative_r1(spark):
    # 1,5,1,5,... : dev alternates sign, so r_1 is strongly negative and
    # r_2 is strongly positive (period-2 seasonality)
    series = {"view": [1, 5] * 8}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["lag"]: r for r in got}
    assert by[1]["acf"] < -0.8 and by[2]["acf"] > 0.8
    # deviation-pure check: dev = 16c - 48 = ±32, r_2's num/den ratio is
    # exactly (D-2)/D on a perfectly periodic pure series
    assert by[2]["acf_num"] == by[2]["acf_den"] // 16 * 14


def test_acf_constant_series_null(spark):
    series = {"view": [4] * 10}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert len(got) == 9 if _ACF_MAX_LAG >= 9 else _ACF_MAX_LAG
    assert all(r["acf"] is None and r["acf_den"] == 0 for r in got)


def test_acf_short_series_lag_truncated(spark):
    # 4 days -> only lags 1..3 exist
    series = {"view": [1, 2, 3, 4]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert [r["lag"] for r in got] == [1, 2, 3]


def test_acf_two_types_padded_span(spark):
    # 'click' stops 3 days early: the dense union grid zero-pads it, and
    # those zeros are real observations in its ACF
    series = {"view": [2, 3, 4, 5, 6, 7], "click": [9, 9, 9]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert {r["event_type"] for r in got} == {"view", "click"}
    assert all(r["n_days"] == 6 for r in got)


def test_acf_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 0
    for r in a:
        assert 1 <= r["lag"] <= _ACF_MAX_LAG
        assert r["acf"] is None or -1.000001 <= r["acf"] <= 1.000001
    from tests.test_plans import plan_of

    plan = plan_of(acf_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
