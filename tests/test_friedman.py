"""X130 Friedman rank test + Kendall's W (queries.friedman_report):
exact python mirror over planted ASCII corpora, perfectly-consistent
scorer ordering chi2=2n / W=1, all-tied degenerate NULL guard,
zero-token and empty-text blocks dropped, per-block 2r-sum invariant,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_FRIEDMAN)."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import friedman_report

SF = "/root/testdata/sf0.001"

_STOP = r"\b(the|over|quick|dog|fox)\b"


def _scores(text):
    # ASCII-only fixture mirror of normalize_for_scoring + the 3 scorers
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    toks = t.split(" ") if t else []
    nt = len(toks)
    a1 = len(re.findall(_STOP, t))
    a2 = len(set(toks))
    a3 = len(re.sub(r"[^a-zA-Z]", "", text))
    b3 = len(text)
    return a1, a2, nt, a3, b3


def _mirror(texts):
    rows = []
    for text in texts:
        a1, a2, nt, a3, b3 = _scores(text)
        if nt == 0 or b3 == 0:
            continue
        # cross-multiplied rational comparisons, 2r ranks
        vals = [(a1, nt), (a2, nt), (a3, b3)]

        def r2(i):
            ni, di = vals[i]
            lt = eq = 0
            for j in range(3):
                if j == i:
                    continue
                nj, dj = vals[j]
                if nj * di < ni * dj:
                    lt += 1
                elif nj * di == ni * dj:
                    eq += 1
            return 2 + 2 * lt + eq

        rows.append((r2(0), r2(1), r2(2)))
    n = len(rows)
    s = [sum(r[j] for r in rows) for j in range(3)]
    a4 = sum(r[0] ** 2 + r[1] ** 2 + r[2] ** 2 for r in rows)
    den = a4 - 48 * n
    chi2 = 2.0 * (s[0] ** 2 + s[1] ** 2 + s[2] ** 2 - 48 * n * n) / den if den else None
    return dict(
        n_docs=n,
        r2sum_stop=s[0],
        r2sum_uniq=s[1],
        r2sum_alpha=s[2],
        a4=a4,
        mean_rank_stop=round(s[0] / (2 * n), 6) if n else None,
        mean_rank_uniq=round(s[1] / (2 * n), 6) if n else None,
        mean_rank_alpha=round(s[2] / (2 * n), 6) if n else None,
        chi2_f=round(chi2, 6) if den else None,
        kendall_w=round(chi2 / (2 * n), 6) if den else None,
        reject_h0=(1 if chi2 > 5.991464547107979 else 0) if den else None,
    )


def _write(texts):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang="en", source="s0", n_chars=len(s))
            for i, s in enumerate(texts)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in friedman_report(spark, sf).collect()]


def test_friedman_consistent_ordering_rejects(spark):
    # no stopwords (s1=0) < alpha density (<1) < distinct ratio (=1)
    # in every block: chi2 = 2n, W = 1, reject
    texts = [
        "abc def ghi",
        "jkl mno pqr stu",
        "vwx yza bcd",
        "efg hij klm nop",
        "qrs tuv wxy",
        "zab cde fgh ijk",
    ]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert r["chi2_f"] == float(2 * r["n_docs"])
    assert r["kendall_w"] == 1.0 and r["reject_h0"] == 1


def test_friedman_all_tied_null(spark):
    # single-stopword docs: every scorer is exactly 1 -> all ranks tied,
    # A4 = 48n, chi2/W/reject NULL
    texts = ["the", "dog", "fox", "quick"]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert r["a4"] == 48 * r["n_docs"]
    assert r["chi2_f"] is None and r["kendall_w"] is None
    assert r["reject_h0"] is None


def test_friedman_drops_unrankable_blocks(spark):
    # digits-only normalizes to zero tokens; empty text has b3=0 - both
    # dropped; the remaining two docs still rank
    texts = ["123 456", "", "the quick dog ran", "aaa aaa bbb"]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    assert got[0]["n_docs"] == 2


def test_friedman_rank_sum_invariant(spark):
    # per-block 2r sums are always 12: r2sum columns total 12n
    texts = ["the quick dog", "over the fox jumps", "zzz yyy", "a b c d the"]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert (
        r["r2sum_stop"] + r["r2sum_uniq"] + r["r2sum_alpha"]
        == 12 * r["n_docs"]
    )


def test_friedman_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 1 and a[0]["n_docs"] > 0
    assert 0.0 <= a[0]["kendall_w"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(friedman_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
