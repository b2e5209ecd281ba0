"""X99 isotonic calibration (queries.isotonic_calibration_report):
exact-fraction pool-adjacent-violators stack mirror (independent of the
query's minimax formulation — round(1e9·fit) must agree because round
is monotone and commutes with max/min), planted violator pooling,
already-monotone identity, monotonicity invariant, determinism, plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_ISOTONIC)."""

from __future__ import annotations

import os
import tempfile
from fractions import Fraction

import pandas as pd

from ocr_output_evaluation_spark.queries import isotonic_calibration_report

SF = "/root/testdata/sf0.001"


def _pav(buckets):
    """buckets: list[(score, n, pos)] sorted by score -> iso_nano list via
    the classic weighted PAV stack on EXACT fractions."""
    stack = []  # (n, pos) pooled blocks, each covering a run of buckets
    spans = []
    for _, n, pos in buckets:
        stack.append((n, pos))
        spans.append(1)
        while len(stack) > 1 and Fraction(stack[-2][1], stack[-2][0]) >= Fraction(
            stack[-1][1], stack[-1][0]
        ):
            n1, p1 = stack.pop()
            s1 = spans.pop()
            n0, p0 = stack.pop()
            s0 = spans.pop()
            stack.append((n0 + n1, p0 + p1))
            spans.append(s0 + s1)
    out = []
    for (n, pos), span in zip(stack, spans):
        fit = Fraction(pos, n)
        out += [round(fit * 10**9)] * span
    return out


def _mirror(rows):
    """rows: list[(score, y)] -> report dicts ordered by score."""
    agg: dict[int, list[int]] = {}
    for s, y in rows:
        c = agg.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    buckets = [(s, n, p) for s, (n, p) in sorted(agg.items())]
    nanos = _pav(buckets)
    return [
        dict(
            score=s,
            n_docs=n,
            n_pos=p,
            raw_rate=round(p / n, 6),
            iso_nano=iso,
            iso_rate=round(iso / 1e9, 6),
        )
        for (s, n, p), iso in zip(buckets, nanos)
    ]


def _write(score_rows):
    """score_rows: list[(score, y)] rendered as documents whose stopword
    density IS the score: a doc with score s per mille gets s 'the' tokens
    and 1000-s 'zzz' tokens (1000 total), lang='en' iff y."""
    tmp = tempfile.mkdtemp()
    texts, langs = [], []
    for s, y in score_rows:
        texts.append(" ".join(["the"] * s + ["zzz"] * (1000 - s)))
        langs.append("en" if y else "de")
    pd.DataFrame(
        {
            "doc_id": range(len(score_rows)),
            "text": texts,
            "lang": langs,
            "source": "src0",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in isotonic_calibration_report(spark, sf).collect()]


def test_iso_pools_violators(spark):
    # raw rates 1.0 at score 100 then 0.0 at score 200 MUST pool: the
    # fitted curve is flat at the pooled mean across the violating pair
    rows = [(100, 1)] * 10 + [(200, 0)] * 10 + [(300, 1)] * 20
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {r["score"]: r for r in got}
    assert by[100]["iso_nano"] == by[200]["iso_nano"] == 500_000_000
    assert by[300]["iso_nano"] == 1_000_000_000
    fits = [r["iso_nano"] for r in got]
    assert fits == sorted(fits)


def test_iso_already_monotone_is_identity(spark):
    rows = [(100, y) for y in [0] * 9 + [1]] + [(200, y) for y in [0, 1] * 5] + [
        (300, y) for y in [1] * 9 + [0]
    ]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    for r in got:
        assert r["iso_rate"] == r["raw_rate"]


def test_iso_all_one_class(spark):
    rows = [(s, 0) for s in (100, 200, 300) for _ in range(5)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["iso_nano"] == 0 for r in got)


def test_iso_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    fits = [r["iso_nano"] for r in a]
    assert fits == sorted(fits), "isotonic fit must be monotone"
    assert all(0 <= f <= 10**9 for f in fits)
    # weighted mean is preserved by PAV: sum(n*fit) == 1e9*sum(pos)
    # only within blocks' rounding — check the coarse invariant instead:
    n_tot = sum(r["n_docs"] for r in a)
    err = sum(r["n_docs"] * (r["iso_nano"] / 1e9 - r["n_pos"] / r["n_docs"]) for r in a)
    assert abs(err) < 1e-3 * n_tot
    from tests.test_plans import plan_of

    plan = plan_of(isotonic_calibration_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" in plan and "HashAggregate" in plan
