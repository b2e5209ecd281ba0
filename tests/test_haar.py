"""X124 Haar wavelet energy decomposition (queries.haar_report): exact
python pyramid mirror, period-2 alternation loads ONLY level 1, a
16/16-day block shift loads ONLY level 5, constant series zero energy,
Parseval-style window-total pin, determinism + share invariants, plan
pins. DuckDB value identity is the oracle gate's job (_oracle_haar)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _HAAR_LEVELS, haar_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    """series: dict[type, list[count] (day offsets from the global min)]."""
    out = []
    for ty in sorted(series):
        a = list(series[ty])[:32] + [0] * max(0, 32 - len(series[ty]))
        energies = {}
        for k in range(1, _HAAR_LEVELS + 1):
            nxt, dv = [], []
            for i in range(0, len(a), 2):
                nxt.append(a[i] + a[i + 1])
                dv.append(a[i] - a[i + 1])
            energies[k] = sum(d * d for d in dv)
            a = nxt
        tot = a[0]
        etot = sum(energies.values())
        for k in range(1, _HAAR_LEVELS + 1):
            out.append(
                dict(
                    event_type=ty,
                    level=k,
                    energy=energies[k],
                    window_total=tot,
                    energy_share=round(energies[k] / etot, 6) if etot > 0 else None,
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
    return [r.asDict() for r in haar_report(spark, sf).collect()]


def test_haar_alternation_level1_only(spark):
    # 3,1,3,1,... : every pair differs by 2, every pair-sum is constant 4
    # -> ALL energy at level 1 (32 slots x nothing above)
    series = {"view": [3, 1] * 16}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["level"]: r for r in got}
    assert by[1]["energy"] == 16 * 4 and by[1]["energy_share"] == 1.0
    assert all(by[k]["energy"] == 0 for k in range(2, 6))


def test_haar_block_shift_level5_only(spark):
    # 16 days at 5 then 16 days at 1: constant inside every sub-block,
    # the only nonzero detail is the final 16v16 split at level 5
    series = {"view": [5] * 16 + [1] * 16}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {r["level"]: r for r in got}
    assert all(by[k]["energy"] == 0 for k in range(1, 5))
    assert by[5]["energy"] == (16 * 5 - 16 * 1) ** 2
    assert by[5]["energy_share"] == 1.0


def test_haar_constant_zero_energy(spark):
    series = {"view": [7] * 32}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert all(r["energy"] == 0 and r["energy_share"] is None for r in got)
    assert got[0]["window_total"] == 7 * 32


def test_haar_short_series_zero_padded(spark):
    # only 4 active days: the window zero-pads to 32 and the pad edge
    # itself is energy (a real crawl-stop signal)
    series = {"view": [2, 2, 2, 2]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["window_total"] == 8


def test_haar_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 5 * _HAAR_LEVELS
    for ty in {r["event_type"] for r in a}:
        shares = [r["energy_share"] for r in a if r["event_type"] == ty]
        if shares[0] is not None:
            assert abs(sum(shares) - 1.0) < 1e-4
    from tests.test_plans import plan_of

    plan = plan_of(haar_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
