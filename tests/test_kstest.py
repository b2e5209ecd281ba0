"""X92 two-sample Kolmogorov-Smirnov drift test (queries.ks_test_report):
exact python-mirror of the integer cross-multiplied ECDF gap on the
sf0.001 fixture, statistic bounds, determinism, plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_KS_TEST)."""

from __future__ import annotations

import math

import pandas as pd

from ocr_output_evaluation_spark.queries import ks_test_report

SF = "/root/testdata/sf0.001"


def _mirror():
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    a = sorted(docs[docs["lang"] == "en"]["n_chars"].tolist())
    b = sorted(docs[docs["lang"] == "es"]["n_chars"].tolist())
    n_a, n_b = len(a), len(b)
    vals = sorted(set(a) | set(b))
    best_num, best_loc = -1, None
    for v in vals:
        cuma = sum(1 for x in a if x <= v)
        cumb = sum(1 for x in b if x <= v)
        num = abs(cuma * n_b - cumb * n_a)
        if num > best_num:
            best_num, best_loc = num, v
    d_raw = best_num / (n_a * n_b)
    crit_raw = math.sqrt(-math.log(0.025) / 2.0) * math.sqrt(
        (n_a + n_b) / (n_a * n_b)
    )
    return (
        n_a,
        n_b,
        best_num,
        best_loc,
        round(d_raw, 6),
        round(crit_raw, 6),
        1 if d_raw > crit_raw else 0,
    )


def test_ks_python_mirror(spark):
    n_a, n_b, d_num, d_loc, d_stat, d_crit, reject = _mirror()
    rows = ks_test_report(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_a, r.n_b) == (n_a, n_b)
    assert (r.d_num, r.d_location) == (d_num, d_loc)
    assert (r.d_stat, r.d_crit, r.reject_h0) == (d_stat, d_crit, reject)
    # D is a normalized sup-gap: within [0, 1]
    assert 0.0 <= r.d_stat <= 1.0


def test_ks_identical_distribution_accepts(spark):
    # en-vs-en via a doctored frame: D must be exactly 0 and H0 retained —
    # exercised through the same ECDF arithmetic on a two-group copy
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    en = docs[docs["lang"] == "en"].copy()
    es = en.copy()
    es["lang"] = "es"
    both = pd.concat([en, es], ignore_index=True)
    both["doc_id"] = range(len(both))
    both["text"] = ""
    both["source"] = "src0"
    import tempfile, os

    tmp = tempfile.mkdtemp()
    both[["doc_id", "text", "lang", "source", "n_chars"]].to_parquet(
        os.path.join(tmp, "documents.parquet")
    )
    r = ks_test_report(spark, tmp).collect()[0]
    assert r.d_num == 0 and r.d_stat == 0.0 and r.reject_h0 == 0


def test_ks_determinism_and_plan(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in ks_test_report(spark, SF).collect()]
    b = [tuple(r) for r in ks_test_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(ks_test_report(spark, SF))
    # nothing drops to Python; the cumulative window runs on the bounded
    # distinct-value frame only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
