"""X93 Spearman rank correlation (queries.spearman_report): exact
python-mirror of the tie-corrected average-rank Pearson form (double-rank
integers, replicated sum-for-sum) on the sf0.001 fixture, scipy-free
cross-check via hand rank arithmetic, bounds, determinism, plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_SPEARMAN)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import spearman_report
from tests.test_corpus_stats import _tokens

SF = "/root/testdata/sf0.001"


def _rank2(values):
    """value -> 2x average rank, via 2*(cum_before) + cnt + 1."""
    cnt = Counter(values)
    out, cum = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    return out


def _mirror():
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "n_chars", "text"]
    )
    rows = {}
    for lang, grp in docs.groupby("lang"):
        xs = grp["n_chars"].astype(int).tolist()
        ys = [len(set(_tokens(t))) for t in grp["text"]]
        rx, ry = _rank2(xs), _rank2(ys)
        r2x = [rx[v] for v in xs]
        r2y = [ry[v] for v in ys]
        n = len(xs)
        sx, sy = sum(r2x), sum(r2y)
        sxx = sum(v * v for v in r2x)
        syy = sum(v * v for v in r2y)
        sxy = sum(a * b for a, b in zip(r2x, r2y))
        num = float(n) * float(sxy) - float(sx) * float(sy)
        denx = float(n) * float(sxx) - float(sx) * float(sx)
        deny = float(n) * float(syy) - float(sy) * float(sy)
        rho = round(num / math.sqrt(denx * deny), 6) if denx * deny > 0 else None
        rows[lang] = (n, rho)
    return rows


def test_spearman_python_mirror(spark):
    want = _mirror()
    got = {r.lang: (r.n_docs, r.rho_chars_types) for r in spearman_report(spark, SF).collect()}
    assert got == want
    for n, rho in got.values():
        assert rho is None or -1.0 <= rho <= 1.0


def test_spearman_perfect_and_inverted(spark):
    # planted monotone frame: y strictly increasing with x -> rho exactly 1;
    # a second lang with y strictly decreasing -> rho exactly -1
    import os
    import tempfile

    n = 40
    up = pd.DataFrame(
        {
            "doc_id": range(n),
            # i+1 distinct letter-only tokens (normalization strips digits):
            # 'waa wab ...' -> types strictly increase with i
            "text": [
                " ".join(
                    "w" + chr(97 + k // 26) + chr(97 + k % 26) for k in range(i + 1)
                )
                for i in range(n)
            ],
            "lang": "up",
            "source": "src0",
            "n_chars": [10 + 3 * i for i in range(n)],
        }
    )
    down = up.copy()
    down["lang"] = "down"
    down["n_chars"] = [10 + 3 * (n - 1 - i) for i in range(n)]
    tmp = tempfile.mkdtemp()
    pd.concat([up, down], ignore_index=True).to_parquet(
        os.path.join(tmp, "documents.parquet")
    )
    got = {r.lang: r.rho_chars_types for r in spearman_report(spark, tmp).collect()}
    assert got == {"up": 1.0, "down": -1.0}


def test_spearman_determinism_and_plan(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in spearman_report(spark, SF).collect()]
    b = [tuple(r) for r in spearman_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(spearman_report(spark, SF))
    # rank windows partition by lang over distinct-value frames; the final
    # moment agg is ONE hash aggregate; nothing drops to Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
