"""X115 CUSUM changepoint (queries.cusum_report): exact-integer python
mirror over planted daily series, step-shift located exactly at the
step, flat series zero-cusum first-day tiebreak, silent-day zero-fill
shifts the argmax, single-day guard, determinism + scaled-identity
invariants, plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_CUSUM)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import cusum_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700  # 2023-12-08, arbitrary base day


def _mirror(series):
    """series: dict[type, dict[day_offset, count]] -> report dicts.
    The day span is the union across types (dense, zero-filled)."""
    all_days = sorted({d for s in series.values() for d in s})
    lo, hi = all_days[0], all_days[-1]
    days = list(range(lo, hi + 1))
    out = []
    for ty in sorted(series):
        cs = [series[ty].get(d, 0) for d in days]
        D, T = len(cs), sum(cs)
        pre = 0
        best = None
        for k, (d, c) in enumerate(zip(days, cs), start=1):
            pre += c
            cus = D * pre - k * T
            if k < D or D == 1:
                key = (-abs(cus), d)
                if best is None or key < best[0]:
                    best = (key, d, k, cus)
        _, d, k, cus = best
        out.append(
            dict(
                event_type=ty,
                n_days=D,
                n_events=T,
                cp_day=EPOCH0 + d,
                cp_k=k,
                cusum_scaled=cus,
                max_abs_cusum=abs(cus),
                mean_per_day=round(T / D, 6),
            )
        )
    return out


def _write(series):
    tmp = tempfile.mkdtemp()
    recs = []
    eid = 0
    for ty, s in series.items():
        for d, c in s.items():
            for i in range(c):
                recs.append(
                    dict(
                        event_id=eid,
                        ts=pd.Timestamp(
                            (EPOCH0 + d) * DAY_US + i * 1_000_000, unit="us"
                        ),
                        user_id=eid % 7,
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
    return [r.asDict() for r in cusum_report(spark, sf).collect()]


def test_cusum_step_shift_located(spark):
    # 5 days at 2/day then 5 days at 10/day: argmax |cusum| at the step
    series = {"view": {d: (2 if d < 5 else 10) for d in range(10)}}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["cp_k"] == 5 and got[0]["cp_day"] == EPOCH0 + 4
    # cus_5 = 10*10 - 5*60 = -200 (below-mean run before the jump)
    assert got[0]["cusum_scaled"] == -200


def test_cusum_flat_series_first_day_tiebreak(spark):
    series = {"view": {d: 3 for d in range(6)}}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["max_abs_cusum"] == 0 and got[0]["cp_k"] == 1


def test_cusum_silent_days_zero_filled(spark):
    # events only on days 0 and 9; the dense grid makes days 1-8 real
    # zeros, so the changepoint lands after the day-0 burst
    series = {"click": {0: 12, 9: 0}, "view": {0: 1, 9: 1}}
    series["click"] = {0: 12}
    series["view"] = {0: 1, 9: 1}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["event_type"]: r for r in got}
    assert by["click"]["n_days"] == 10  # span is the global union
    assert by["click"]["cp_k"] == 1  # all mass on day 0
    assert by["click"]["cusum_scaled"] == 10 * 12 - 1 * 12


def test_cusum_single_day_guard(spark):
    series = {"view": {3: 5}}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["n_days"] == 1 and got[0]["cusum_scaled"] == 0


def test_cusum_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        assert r["max_abs_cusum"] == abs(r["cusum_scaled"])
        assert 1 <= r["cp_k"] <= r["n_days"]
    from tests.test_plans import plan_of

    plan = plan_of(cusum_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
