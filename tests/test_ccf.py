"""X148 cross-correlation lead-lag (queries.ccf_leadlag_report): exact
python mirror over planted daily series, a 2-day-shifted copy is
located at best_lag=+2, anti-correlated pairs elect a negative peak,
constant types NULL their ratios with the tie-broken zero lag, overlap
truncation counts pinned, determinism + plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_CCF_LEADLAG)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    _CCF_MAX_LAG,
    ccf_leadlag_report,
)

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    span = max(len(s) for s in series.values())
    devs = {}
    qs = {}
    for ty, cs0 in series.items():
        cs = list(cs0) + [0] * (span - len(cs0))
        tt = sum(cs)
        dv = [span * c - tt for c in cs]
        devs[ty] = dv
        qs[ty] = sum(d * d for d in dv)
    out = []
    tys = sorted(series)
    for i, a in enumerate(tys):
        for b in tys[i + 1 :]:
            rows = []
            for h in range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1):
                num = 0
                n_ov = 0
                for t in range(span):
                    u = t + h
                    if 0 <= u < span:
                        num += devs[a][t] * devs[b][u]
                        n_ov += 1
                if n_ov == 0:
                    continue  # no-overlap lags emit no row (inner join)
                ccf = (
                    num / (math.sqrt(qs[a]) * math.sqrt(qs[b]))
                    if qs[a] > 0 and qs[b] > 0
                    else None
                )
                rows.append((h, n_ov, num, ccf))
            key = max(
                (abs(num), -abs(h), -h, ccf) for h, _, num, ccf in rows
            )
            best_lag, best_ccf = -key[2], key[3]
            for h, n_ov, num, ccf in rows:
                out.append(
                    dict(
                        type_a=a,
                        type_b=b,
                        lag=h,
                        n_overlap=n_ov,
                        num_exact=str(num),
                        ccf=round(ccf, 6) if ccf is not None else None,
                        best_lag=best_lag,
                        best_ccf=round(best_ccf, 6)
                        if best_ccf is not None
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
    return [r.asDict() for r in ccf_leadlag_report(spark, sf).collect()]


def test_ccf_shifted_copy_located(spark):
    # bb is aa delayed by 2 days: the peak sits at lag +2
    base = [3, 9, 1, 14, 2, 8, 5, 11, 4, 13, 6, 2, 9, 1, 12, 7]
    series = {"aa": base + [0, 0], "bb": [0, 0] + base}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["best_lag"] == 2 and r["best_ccf"] > 0.8


def test_ccf_anticorrelated_negative_peak(spark):
    a = [1, 9] * 8
    b = [9, 1] * 8
    series = {"aa": a, "bb": b}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["best_ccf"] < -0.8
    assert r["best_lag"] in (0, -1, 1)


def test_ccf_constant_type_null(spark):
    series = {"aa": [5] * 12, "bb": [1, 9] * 6}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert all(r["ccf"] is None for r in got)
    # all |num| = 0: tie-broken to the smallest |h| -> lag 0
    assert got[0]["best_lag"] == 0 and got[0]["best_ccf"] is None


def test_ccf_overlap_truncation(spark):
    series = {"aa": [2, 7, 4, 9], "bb": [5, 1, 8, 3]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["lag"]: r["n_overlap"] for r in got}
    assert by[0] == 4 and by[3] == 1 and by[-3] == 1


def test_ccf_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    tys = {r["type_a"] for r in a} | {r["type_b"] for r in a}
    k = len(tys)
    assert len(a) == k * (k - 1) // 2 * (2 * _CCF_MAX_LAG + 1)
    for r in a:
        assert r["ccf"] is None or -1.0 <= r["ccf"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(ccf_leadlag_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
