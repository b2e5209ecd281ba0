"""X126 OLS daily-volume trend (queries.ols_trend_report): exact-moment
python mirror, perfect line slope/intercept/R²=1 recovered exactly,
flat series slope 0 with R² NULL (zero S_yy), V-shape slope 0 with
R²=0, silent-day zero-fill bends the line, determinism + moment
identities, plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_OLS_TREND)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import ols_trend_report

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
        syy = n * sum(y * y for y in ys) - sy * sy
        slope = sxy / sxx if sxx > 0 else None
        out.append(
            dict(
                event_type=ty,
                n_days=n,
                n_events=sy,
                s_xx=sxx,
                s_xy=sxy,
                s_yy=syy,
                slope_per_day=round(slope, 6) if sxx > 0 else None,
                intercept=round((sy - slope * sx) / n, 6) if sxx > 0 else None,
                r2=round(sxy * sxy / (sxx * syy), 6)
                if sxx > 0 and syy > 0
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
    return [r.asDict() for r in ols_trend_report(spark, sf).collect()]


def test_ols_perfect_line(spark):
    # y = 2x + 1 for x=1..8: slope 2, intercept 3 (y(0)=3 since y_1=3), R²=1
    series = {"view": [2 * x + 1 for x in range(1, 9)]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["slope_per_day"] == 2.0 and r["r2"] == 1.0
    assert r["intercept"] == 1.0  # y = 2x + 1 at x = 0


def test_ols_flat_series(spark):
    series = {"view": [4] * 10}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["slope_per_day"] == 0.0 and r["s_yy"] == 0 and r["r2"] is None
    assert r["intercept"] == 4.0


def test_ols_vshape_zero_slope(spark):
    # symmetric V: no linear trend, slope 0, R² = 0 exactly
    series = {"view": [5, 4, 3, 2, 3, 4, 5]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["slope_per_day"] == 0.0 and r["r2"] == 0.0


def test_ols_silent_tail_bends_line(spark):
    # rising 4 days then silence: the zero-fill drags the slope negative
    series = {"view": [2, 4, 6, 8], "click": [1] * 8}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["event_type"]: r for r in got}
    assert by["view"]["n_days"] == 8 and by["view"]["slope_per_day"] < 0


def test_ols_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert r["s_xx"] > 0 and r["s_yy"] >= 0
        assert r["r2"] is None or 0.0 <= r["r2"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(ols_trend_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
