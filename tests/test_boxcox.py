"""X147 Box-Cox transform selection (queries.boxcox_report): exact
python mirror over planted length sets, geometric lengths elect the
log transform, near-uniform lengths elect identity, constant lengths
NULL out every LL and the election, determinism + plan pins. DuckDB
value identity is the oracle gate's job (ORACLE_BOXCOX)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import boxcox_report

SF = "/root/testdata/sf0.001"

LAMS = (-1.0, -0.5, 0.0, 0.5, 1.0)


def _y(lam, v):
    if lam == -1.0:
        return 1.0 - 1.0 / v
    if lam == -0.5:
        return 2.0 * (1.0 - 1.0 / math.sqrt(v))
    if lam == 0.0:
        return math.log(v)
    if lam == 0.5:
        return 2.0 * (math.sqrt(v) - 1.0)
    return v - 1.0


def _mirror(vals):
    vals = [v for v in vals if v >= 1]
    cell = {}
    for v in vals:
        cell[v] = cell.get(v, 0) + 1
    rows = []
    for lam in LAMS:
        n = sum(cell.values())
        s = sum(c * round(_y(lam, float(v)) * 1e9) for v, c in cell.items())
        q = sum(c * round(_y(lam, float(v)) * 1e9) ** 2 for v, c in cell.items())
        el = sum(c * round(math.log(v) * 1e9) for v, c in cell.items())
        var = (n * float(q) - float(s) * float(s)) / (n * n) / 1e18
        ll = (
            -n / 2.0 * math.log(var) + (lam - 1.0) * float(el) / 1e9
            if var > 0
            else None
        )
        rows.append(
            dict(lam=lam, n_docs=n, s_nano=s, ll=round(ll, 6) if ll is not None else None, _raw=ll)
        )
    valid = [(r["_raw"], -r["lam"]) for r in rows if r["_raw"] is not None]
    if valid:
        raw, nl = max(valid)
        bl, bll = -nl, round(raw, 6)
    else:
        bl = bll = None
    out = []
    for r in rows:
        out.append(
            dict(
                lam=r["lam"],
                n_docs=r["n_docs"],
                s_nano=r["s_nano"],
                ll=r["ll"],
                best_lambda=bl,
                best_ll=bll,
            )
        )
    return out


def _write(vals):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text="x" * v, lang="en", source="s0", n_chars=v)
            for i, v in enumerate(vals)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in boxcox_report(spark, sf).collect()]


def test_boxcox_geometric_elects_log(spark):
    # lengths on a geometric ladder: ln makes them equally spaced, the
    # profile likelihood elects lambda = 0
    vals = [3, 9, 27, 81, 243, 729] * 5
    got = _collect(spark, _write(vals))
    assert got == _mirror(vals)
    assert got[0]["best_lambda"] == 0.0


def test_boxcox_tame_tail_elects_high_lambda(spark):
    # symmetric already-tame lengths: the strong concavifiers lose;
    # the election lands at the top of the grid (0.5 or 1 - the exact
    # winner between those two is a fine balance of the Jacobian term,
    # pinned by the mirror)
    vals = list(range(100, 131)) * 3
    got = _collect(spark, _write(vals))
    assert got == _mirror(vals)
    assert got[0]["best_lambda"] >= 0.5
    by = {r["lam"]: r["ll"] for r in got}
    assert by[1.0] > by[-1.0] and by[0.5] > by[-0.5]


def test_boxcox_constant_null(spark):
    vals = [50] * 12
    got = _collect(spark, _write(vals))
    assert got == _mirror(vals)
    assert all(r["ll"] is None for r in got)
    assert got[0]["best_lambda"] is None and got[0]["best_ll"] is None


def test_boxcox_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 5 and a[0]["best_lambda"] is not None
    assert [r["lam"] for r in a] == list(LAMS)
    assert len({r["best_lambda"] for r in a}) == 1
    from tests.test_plans import plan_of

    plan = plan_of(boxcox_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
