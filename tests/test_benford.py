"""X117 Benford first-digit audit (queries.benford_report): exact-nano
python mirror over planted price sets, a Benford-conforming geometric
set scores low MAD, a single-digit-stuffed set scores a huge chi2,
zero-count digits zero-filled, cent-rounding first-digit edge, nano
literals sanity-pinned against math.log10, determinism + partition
invariants, plan pins. DuckDB value identity is the oracle gate's job
(_oracle_benford)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import _BENFORD_NANO, benford_report

SF = "/root/testdata/sf0.001"


def test_benford_nano_literals_match_log10():
    for d in range(1, 10):
        assert _BENFORD_NANO[d] == round(1e9 * math.log10(1 + 1 / d))


def _mirror(prices):
    cents = [round(p * 100) for p in prices]
    cnt = Counter(int(str(c)[0]) for c in cents if c > 0)
    nt = sum(cnt.values())
    rows = []
    devs = {}
    for d in range(1, 10):
        n = cnt.get(d, 0)
        devs[d] = n * 10**9 - nt * _BENFORD_NANO[d]
    chi2 = sum(
        (devs[d] ** 2) / (1e9 * nt * _BENFORD_NANO[d]) for d in range(1, 10)
    )
    mad_num = sum(abs(devs[d]) for d in range(1, 10))
    for d in range(1, 10):
        n = cnt.get(d, 0)
        rows.append(
            dict(
                digit=d,
                n_obs=n,
                p_nano=_BENFORD_NANO[d],
                n_orders=nt,
                _dev_nano=devs[d],
                obs_prop=round(n / nt, 6),
                exp_count=round(nt * _BENFORD_NANO[d] / 1e9, 6),
                chi2=round(chi2, 6),
                mad=round(mad_num / (9e9 * nt), 6),
            )
        )
    return rows


def _write(prices):
    tmp = tempfile.mkdtemp()
    n = len(prices)
    df = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": [i % 7 for i in range(n)],
            "o_orderstatus": "F",
            "o_totalprice": prices,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
            "o_orderpriority": "1-URGENT",
        }
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "orders.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in benford_report(spark, sf).collect()]


def _benford_sample(n=300):
    # deterministic geometric ramp: first digits of 10**(k/n) over a few
    # decades follow Benford closely (the classical construction)
    return [round(10 ** (3 + (i * 7 % n) / n * 3), 2) for i in range(n)]


def test_benford_conforming_low_mad(spark):
    prices = _benford_sample()
    got = _collect(spark, _write(prices))
    assert got == _mirror(prices)
    assert got[0]["mad"] < 0.02  # Nigrini close-conformity band
    assert got[0]["n_orders"] == len(prices)


def test_benford_stuffed_digit_huge_chi2(spark):
    # all prices start with 5: a fabricated-data fingerprint
    prices = [5000.00 + i for i in range(100)]
    got = _collect(spark, _write(prices))
    assert got == _mirror(prices)
    by = {r["digit"]: r for r in got}
    assert by[5]["n_obs"] == 100 and by[1]["n_obs"] == 0
    assert by[1]["chi2"] > 100  # chi2 crit at 8 dof ~ 20
    assert all(r["n_obs"] == 0 for d, r in by.items() if d != 5)


def test_benford_cent_rounding_first_digit(spark):
    # 0.999 rounds to 100 cents -> digit 1; 0.094 rounds to 9 cents -> 9
    prices = [0.999, 0.094]
    got = _collect(spark, _write(prices))
    assert got == _mirror(prices)
    by = {r["digit"]: r for r in got}
    assert by[1]["n_obs"] == 1 and by[9]["n_obs"] == 1


def test_benford_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert [r["digit"] for r in a] == list(range(1, 10))
    assert sum(r["n_obs"] for r in a) == a[0]["n_orders"]
    assert len({r["chi2"] for r in a}) == 1  # constant columns
    from tests.test_plans import plan_of

    plan = plan_of(benford_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
