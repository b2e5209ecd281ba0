"""X107 Cochran-Armitage trend (queries.ca_trend_report): exact-integer
mirror, planted rising/flat/falling trends, single-class NULL guard,
determinism, plan pins. DuckDB value identity is the oracle gate's job
(ORACLE_CA_TREND)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import ca_trend_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(bucket, y)] -> 1-row dict."""
    d = defaultdict(lambda: [0, 0])
    for k, y in rows:
        d[k][0] += 1
        d[k][1] += y
    n = sum(v[0] for v in d.values())
    r = sum(v[1] for v in d.values())
    a = sum(k * v[1] for k, v in d.items())
    b = sum(k * v[0] for k, v in d.items())
    c = sum(k * k * v[0] for k, v in d.items())
    t_num = n * a - r * b
    var = r * (n - r) * (n * c - b * b) / n
    z = round(t_num / math.sqrt(var), 6) if var > 0 else None
    return dict(
        n_docs=n,
        n_pos=r,
        n_buckets=len(d),
        s_r_sum=a,
        s_n_sum=b,
        s2_n_sum=c,
        t_num=t_num,
        z_ca=z,
    )


def _write(rows):
    """rows: list[(bucket 0..127, y)] -> documents with n_chars = k*256."""
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x"] * len(rows),
            "lang": ["en" if y else "de" for _, y in rows],
            "source": "src0",
            "n_chars": [k * 256 for k, _ in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _one(spark, sf):
    rows = ca_trend_report(spark, sf).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_ca_rising_trend(spark):
    rows = (
        [(0, 1)] * 1 + [(0, 0)] * 9
        + [(1, 1)] * 5 + [(1, 0)] * 5
        + [(2, 1)] * 9 + [(2, 0)] * 1
    )
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["z_ca"] > 3.0


def test_ca_flat_no_trend(spark):
    # identical rate in every bucket -> T numerator exactly 0
    rows = [(k, y) for k in (0, 1, 2, 3) for y in (1, 0, 0, 0)]
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["t_num"] == 0 and got["z_ca"] == 0.0


def test_ca_falling_trend_negative(spark):
    rows = [(0, 1)] * 8 + [(0, 0)] * 2 + [(3, 1)] * 2 + [(3, 0)] * 8
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["z_ca"] < -2.0


def test_ca_single_class_null(spark):
    rows = [(k, 0) for k in (0, 1, 2) for _ in range(3)]
    got = _one(spark, _write(rows))
    assert got == _mirror(rows)
    assert got["z_ca"] is None  # var == 0 guard


def test_ca_sf_determinism_and_plan(spark):
    a = _one(spark, SF)
    assert a == _one(spark, SF)
    assert a["n_pos"] <= a["n_docs"]
    assert a["s_r_sum"] <= a["s_n_sum"]
    from tests.test_plans import plan_of

    plan = plan_of(ca_trend_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
