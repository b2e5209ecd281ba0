"""X139 Hurst rescaled-range exponent (queries.hurst_rs_report): exact
python mirror over planted daily series, monotone ramp H near 1 beats
the alternating anti-persistent series, constant series drops out
entirely (zero-variance blocks), incomplete tail blocks dropped,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_HURST_RS)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    _HURST_LN,
    _HURST_SIZES,
    hurst_rs_report,
)

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        pts = []
        for n in _HURST_SIZES:
            rss = []
            for b in range(len(cs) // n):
                blk = cs[b * n : (b + 1) * n]
                sb, qb = sum(blk), sum(c * c for c in blk)
                vn = n * qb - sb * sb
                if vn <= 0:
                    continue
                ds = []
                pref = 0
                for i, c in enumerate(blk, 1):
                    pref += c
                    ds.append(n * pref - i * sb)
                r = max(ds) - min(ds)
                rss.append(round(r / math.sqrt(vn) * 1e9))
            if rss:
                nb, ssum = len(rss), sum(rss)
                pts.append(
                    dict(
                        event_type=ty,
                        size=n,
                        n_blocks=nb,
                        sum_rs_nano=ssum,
                        mean_rs=round(ssum / (1e9 * nb), 6),
                        x_nano=_HURST_LN[n],
                        y_nano=round(math.log(ssum / (1e9 * nb)) * 1e9),
                    )
                )
        m = len(pts)
        if m:
            sx = sum(p["x_nano"] for p in pts)
            sy = sum(p["y_nano"] for p in pts)
            sxx = sum(p["x_nano"] ** 2 for p in pts)
            sxy = sum(p["x_nano"] * p["y_nano"] for p in pts)
            den = float(m) * float(sxx) - float(sx) * float(sx)
            h = (
                round(
                    (float(m) * float(sxy) - float(sx) * float(sy)) / den, 6
                )
                if den != 0
                else None
            )
            for p in pts:
                p.update(n_points=m, hurst_h=h)
            out.extend(pts)
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
    return [r.asDict() for r in hurst_rs_report(spark, sf).collect()]


def test_hurst_ramp_beats_alternation(spark):
    # 64 days: a monotone ramp (persistent, R grows ~ n) vs a strict
    # alternation (anti-persistent, R stays O(1) per block)
    series = {
        "ramp": list(range(1, 65)),
        "flip": [1, 9] * 32,
    }
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {(r["event_type"], r["size"]): r for r in got}
    h_ramp = by[("ramp", 8)]["hurst_h"]
    h_flip = by[("flip", 8)]["hurst_h"]
    assert h_ramp > 0.8 and h_flip < 0.3 and h_ramp > h_flip
    # complete blocks only: 8/4/2 blocks for sizes 8/16/32
    assert by[("ramp", 8)]["n_blocks"] == 8
    assert by[("ramp", 16)]["n_blocks"] == 4
    assert by[("ramp", 32)]["n_blocks"] == 2


def test_hurst_constant_series_absent(spark):
    # a constant series has zero variance in every block: every block
    # drops, the type emits no rows; the co-written varying type stays
    series = {"flat": [5] * 64, "vary": [1, 9] * 32}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert {r["event_type"] for r in got} == {"vary"}


def test_hurst_incomplete_tail_dropped(spark):
    # 20 days: size 8 -> 2 blocks, size 16 -> 1, size 32 -> none
    series = {"view": [3, 7, 2, 9, 5, 1, 8, 4] * 2 + [6, 2, 7, 1]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    sizes = {r["size"]: r["n_blocks"] for r in got}
    assert sizes == {8: 2, 16: 1}
    assert all(r["n_points"] == 2 for r in got)


def test_hurst_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    if a:
        assert all(r["mean_rs"] > 0 for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(hurst_rs_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
