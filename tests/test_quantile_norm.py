"""X98 per-source quantile normalization (queries.quantile_norm_report):
hand-computed python mirror (rank-interpolated pooled lookup), planted
low-scoring source (positive shifts), identical-mix identity (zero
shifts), singleton-source median mapping, determinism, plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_QUANTILE_NORM)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import quantile_norm_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, n_chars)] -> report dicts ordered (source, decile)."""
    pooled = sorted(v for _, v in rows)
    n_all = len(pooled)
    out = []
    for s in sorted({s for s, _ in rows}):
        vals = sorted(v for src, v in rows if src == s)
        n_src = len(vals)
        for d in range(1, 11):
            r_d = (d * n_src + 9) // 10
            if n_src > 1:
                k = 1 + (r_d - 1) * (n_all - 1) // (n_src - 1)
            else:
                k = (n_all + 1) // 2
            out.append(
                dict(
                    source=s,
                    decile=d,
                    n_src=n_src,
                    src_rank=r_d,
                    src_value=vals[r_d - 1],
                    pooled_rank=k,
                    pooled_value=pooled[k - 1],
                    shift=pooled[k - 1] - vals[r_d - 1],
                )
            )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["w" * n for _, n in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [n for s, n in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in quantile_norm_report(spark, sf).collect()]


def test_qn_planted_low_source_shifts_up(spark):
    # two balanced sources spanning 100..1000, one source stuck at the
    # bottom of the range -> its normalized (pooled) values sit ABOVE its
    # raw deciles at every decile: shift > 0 throughout
    rows = []
    rows += [("hi1", 100 + 9 * i) for i in range(100)]
    rows += [("hi2", 105 + 9 * i) for i in range(100)]
    rows += [("low", 100 + i % 20) for i in range(50)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    low = [r for r in got if r["source"] == "low"]
    assert len(low) == 10
    assert all(r["shift"] > 0 for r in low)


def test_qn_identical_mixes_zero_shift(spark):
    # every source ships the same value mix -> per-source deciles ARE the
    # pooled deciles (rank interpolation lands on the same value), so the
    # calibration table is the identity map
    rows = [(s, v) for s in ("a", "b", "c") for v in range(100, 400, 10)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["shift"] == 0 for r in got)


def test_qn_singleton_source_maps_to_median(spark):
    rows = [("big", 100 + i) for i in range(99)] + [("solo", 5000)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    solo = [r for r in got if r["source"] == "solo"]
    n_all = len(rows)
    pooled = sorted(v for _, v in rows)
    med = pooled[(n_all + 1) // 2 - 1]
    assert all(
        r["pooled_rank"] == (n_all + 1) // 2 and r["pooled_value"] == med
        for r in solo
    )


def test_qn_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    assert a == _mirror([(r.source, int(r.n_chars)) for r in docs.itertuples()])
    # monotone within a source: deciles are non-decreasing in both scales
    for s in {r["source"] for r in a}:
        rs = [r for r in a if r["source"] == s]
        assert [r["decile"] for r in rs] == list(range(1, 11))
        assert rs == sorted(rs, key=lambda r: r["decile"])
        assert all(
            x["src_value"] <= y["src_value"]
            and x["pooled_value"] <= y["pooled_value"]
            for x, y in zip(rs, rs[1:])
        )
    from tests.test_plans import plan_of

    plan = plan_of(quantile_norm_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both rank->value lookups must broadcast the tiny decile frame
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
