"""X135 per-source Hellinger/Bhattacharyya vs pooled (queries.
hellinger_report): exact nano-mirror over planted length corpora,
identical-to-pooled source BC~1/H~0, disjoint-shape source pushed
toward H->1 (BC still >0 vs pooled since pooled contains the source),
metric bounds, determinism + plan pins. DuckDB value identity is the
oracle gate's job (ORACLE_HELLINGER)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import hellinger_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    # rows: list of (source, n_chars)
    cs = {}
    pooled = {}
    for s, v in rows:
        cs[(s, v)] = cs.get((s, v), 0) + 1
        pooled[v] = pooled.get(v, 0) + 1
    ns = {}
    for (s, v), c in cs.items():
        ns[s] = ns.get(s, 0) + c
    n = sum(pooled.values())
    out = []
    for s in sorted(ns):
        bsum = sum(
            round(math.sqrt(c * pooled[v]) * 1e9)
            for (s2, v), c in cs.items()
            if s2 == s
        )
        bc = min(1.0, bsum / (1e9 * math.sqrt(ns[s] * n)))
        out.append(
            dict(
                source=s,
                n_docs=ns[s],
                bc_nano_sum=bsum,
                bhattacharyya_coef=round(bc, 6),
                hellinger=round(math.sqrt(max(0.0, 1.0 - bc)), 6),
                bhattacharyya_dist=round(-math.log(bc), 6) if bc > 0 else None,
            )
        )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text="x" * v, lang="en", source=s, n_chars=v)
            for i, (s, v) in enumerate(rows)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in hellinger_report(spark, sf).collect()]


def test_hellinger_identical_sources(spark):
    # two sources with the same length distribution: each equals the
    # pooled shape exactly -> BC = 1, H = 0, D_B = 0
    rows = [(s, v) for s in ("a", "b") for v in [10, 10, 20, 30, 30, 30]]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    for r in got:
        # sqrt(1-BC) amplifies the nano-term quantization: H lands at
        # ~sqrt(nano) ~ 1e-5 instead of exactly 0 - the documented cost
        # of order-independent term sums
        assert r["bhattacharyya_coef"] == 1.0 and r["hellinger"] < 2e-5
        assert r["bhattacharyya_dist"] == 0.0


def test_hellinger_outlier_source(spark):
    # source b lives on lengths a never touches; vs POOLED it keeps
    # only its own-mass overlap: BC = sqrt(n_b/n), H large
    rows = [("a", v) for v in [10] * 90] + [("b", v) for v in [900] * 10]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {r["source"]: r for r in got}
    assert by["b"]["hellinger"] > by["a"]["hellinger"]
    # closed form: BC_b = sqrt(10*10)*sqrt(... ) -> sqrt(n_b/n)
    assert by["b"]["bhattacharyya_coef"] == round(math.sqrt(10 / 100), 6)


def test_hellinger_bounds(spark):
    rows = [("a", 5), ("a", 7), ("b", 5), ("c", 9), ("c", 5), ("c", 7)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    for r in got:
        assert 0.0 <= r["hellinger"] <= 1.0
        assert 0.0 < r["bhattacharyya_coef"] <= 1.0


def test_hellinger_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 2
    for r in a:
        assert 0.0 <= r["hellinger"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(hellinger_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan