"""X100 Kendall tau-b (queries.kendall_report): brute-force O(n²)
pair-counting mirror (independent of the query's 2D-prefix-sum
formulation), planted concordant/discordant/tied fixtures, perfect
association tau=1, all-tied NULL guard, determinism, plan pins. DuckDB
value identity is the oracle gate's job (ORACLE_KENDALL)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import kendall_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(lang, x_bucket, y_bucket)] -> report dicts by lang,
    counting every unordered pair once."""
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for lang, x, y in rows:
        by_lang.setdefault(lang, []).append((x, y))
    out = []
    for lang in sorted(by_lang):
        pts = by_lang[lang]
        n = len(pts)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
                if s > 0:
                    conc += 1
                elif s < 0:
                    disc += 1
        from collections import Counter

        tx = sum(c * (c - 1) // 2 for c in Counter(p[0] for p in pts).values())
        ty = sum(c * (c - 1) // 2 for c in Counter(p[1] for p in pts).values())
        n0 = n * (n - 1) // 2
        tau = (
            round((conc - disc) / math.sqrt((n0 - tx) * (n0 - ty)), 6)
            if (n0 - tx) * (n0 - ty) > 0
            else None
        )
        out.append(
            dict(
                lang=lang,
                n_docs=n,
                concordant=conc,
                discordant=disc,
                ties_x=tx,
                ties_y=ty,
                tau_b=tau,
            )
        )
    return out


def _write(rows):
    """rows: list[(lang, x_bucket 0..127, y_bucket 0..125)] rendered as
    documents: n_chars = x*256 plants the length bucket exactly; a
    1000-token text with y*8 'the' tokens plants per-mille DIV 8 == y."""
    tmp = tempfile.mkdtemp()
    recs = []
    for i, (lang, x, y) in enumerate(rows):
        s = y * 8
        text = " ".join(["the"] * s + ["zzz"] * (1000 - s))
        recs.append(
            dict(doc_id=i, text=text, lang=lang, source="src0", n_chars=x * 256)
        )
    pd.DataFrame(recs).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in kendall_report(spark, sf).collect()]


def test_kendall_planted_mixed(spark):
    # one concordant pair, one discordant pair, ties in both axes, two langs
    rows = (
        [("en", 1, 1), ("en", 2, 3), ("en", 3, 2), ("en", 3, 2), ("en", 5, 0)]
        + [("de", 0, 5), ("de", 1, 4), ("de", 2, 3), ("de", 3, 2)]
    )
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {r["lang"]: r for r in got}
    assert by["de"]["tau_b"] == -1.0  # strictly decreasing
    assert by["de"]["concordant"] == 0 and by["de"]["discordant"] == 6


def test_kendall_perfect_association(spark):
    rows = [("en", k, k) for k in range(10) for _ in range(k % 3 + 1)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["tau_b"] == 1.0


def test_kendall_all_tied_null(spark):
    rows = [("en", 3, 7)] * 8
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["tau_b"] is None
    assert got[0]["ties_x"] == got[0]["ties_y"] == 28


def test_kendall_independence_symmetric(spark):
    # full 4x4 grid, one doc per cell: C == D by symmetry -> tau == 0
    rows = [("en", x, y) for x in range(4) for y in range(4)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["concordant"] == got[0]["discordant"]
    assert got[0]["tau_b"] == 0.0


def test_kendall_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    for r in a:
        n0 = r["n_docs"] * (r["n_docs"] - 1) // 2
        assert (
            r["concordant"] + r["discordant"] <= n0
        ), "pair counts exceed total pairs"
        assert r["ties_x"] <= n0 and r["ties_y"] <= n0
        if r["tau_b"] is not None:
            assert -1.0 <= r["tau_b"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(kendall_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
