"""X118 lang×length-bucket mutual information (queries.mutual_info_report):
exact-nano python mirror, perfect dependence MI=H (NMI=1), independent
grid MI=0, asymmetric marginal entropies, single-class zero-entropy NULL
guard, determinism + chain-rule bound invariants, plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_MUTUAL_INFO)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import mutual_info_report

SF = "/root/testdata/sf0.001"

LOG2 = 0.6931471805599453


def _mirror(rows):
    """rows: list[(lang, n_chars)] -> report dicts."""
    cell = Counter((lg, nc // 100) for lg, nc in rows)
    nx = Counter()
    ncells = Counter()
    ny = Counter()
    for (lg, b), c in cell.items():
        nx[lg] += c
        ncells[lg] += 1
        ny[b] += c
    nt = sum(cell.values())

    def h_nano(marg):
        return -sum(
            round((c / nt) * (math.log(c / nt) / LOG2) * 1e9) for c in marg.values()
        )

    hx, hy = h_nano(nx), h_nano(ny)
    parts = Counter()
    for (lg, b), c in cell.items():
        arg = c * nt / (nx[lg] * ny[b])
        parts[lg] += round((c / nt) * (math.log(arg) / LOG2) * 1e9)
    mi = sum(parts.values())
    out = []
    for lg in sorted(nx):
        out.append(
            dict(
                lang=lg,
                n_docs=nx[lg],
                n_cells=ncells[lg],
                mi_part_nano=parts[lg],
                mi_nano=mi,
                hx_nano=hx,
                hy_nano=hy,
                n_total=nt,
                mi_bits=round(mi / 1e9, 6),
                h_lang_bits=round(hx / 1e9, 6),
                h_bucket_bits=round(hy / 1e9, 6),
                nmi=round(mi / 1e9 / math.sqrt(hx / 1e9 * hy / 1e9), 6)
                if hx > 0 and hy > 0
                else None,
            )
        )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x" * nc for _, nc in rows],
            "lang": [lg for lg, _ in rows],
            "source": "src0",
            "n_chars": [nc for _, nc in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in mutual_info_report(spark, sf).collect()]


def test_mi_perfect_dependence(spark):
    # lang determines the bucket exactly and marginals are uniform:
    # MI = H(X) = H(Y) = 1 bit -> NMI = 1
    rows = [("en", 50)] * 4 + [("de", 250)] * 4
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["mi_bits"] == 1.0 and got[0]["nmi"] == 1.0
    assert got[0]["h_lang_bits"] == 1.0 and got[0]["h_bucket_bits"] == 1.0


def test_mi_independent_zero(spark):
    # every lang has the same bucket distribution: MI = 0 exactly
    rows = []
    for lg in ("en", "de"):
        rows += [(lg, 50)] * 3 + [(lg, 250)] * 1
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["mi_nano"] == 0 and got[0]["nmi"] == 0.0


def test_mi_single_class_null_guard(spark):
    # one lang only: H(X) = 0 -> NMI NULL, MI = 0
    rows = [("en", 50)] * 3 + [("en", 250)] * 3
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["hx_nano"] == 0 and got[0]["nmi"] is None
    assert got[0]["mi_nano"] == 0


def test_mi_partial_dependence_bounds(spark):
    rows = [("en", 50)] * 3 + [("en", 250)] * 1 + [("de", 250)] * 3 + [("de", 50)] * 1
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    r = got[0]
    assert 0 < r["mi_bits"] < min(r["h_lang_bits"], r["h_bucket_bits"])
    assert 0 < r["nmi"] < 1


def test_mi_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    r = a[0]
    # MI within [0, min(H)] up to nano rounding; partition of mi_nano
    assert -len(a) <= r["mi_nano"] <= min(r["hx_nano"], r["hy_nano"]) + len(a)
    assert sum(x["mi_part_nano"] for x in a) == r["mi_nano"]
    assert sum(x["n_docs"] for x in a) == r["n_total"]
    from tests.test_plans import plan_of

    plan = plan_of(mutual_info_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "BroadcastHashJoin" in plan
