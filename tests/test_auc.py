"""X95 ROC AUC / Mann-Whitney (queries.auc_report): hand-rank python
mirror on planted fixtures (ties, perfect separation, all-tied -> z NULL,
single-class -> AUC NULL), sf0.001 bounds, determinism, plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_AUC)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import auc_report

SF = "/root/testdata/sf0.001"

STOP = {"the", "over", "quick", "dog", "fox"}


def _mw(pairs):
    """pairs: list[(score int, y 0/1)] -> (n_pos, n_neg, u2, auc, z)."""
    cnt = Counter(s for s, _ in pairs)
    pos_c = Counter(s for s, y in pairs if y)
    cum, r2, tie = 0, {}, 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
        tie += cnt[v] ** 3 - cnt[v]
    n = len(pairs)
    n1 = sum(y for _, y in pairs)
    n0 = n - n1
    r2pos = sum(pos_c[v] * r2[v] for v in pos_c)
    u2 = r2pos - n1 * (n1 + 1)
    auc = round(u2 / (2.0 * n1 * n0), 6) if n1 * n0 else None
    tie_frac = tie / (n * (n - 1)) if n > 1 else 0.0
    var = n1 * n0 / 12.0 * ((n + 1) - tie_frac)
    z = (
        round((u2 - n1 * n0) / (2.0 * math.sqrt(var)), 6)
        if n1 * n0 and var > 0
        else None
    )
    return n1, n0, u2, auc, z


def _scores(text: str):
    toks = text.split()
    hits = sum(1 for w in toks if w.lower() in STOP)
    ndot = sum(1 for ch in text if ch == ".")
    s_stop = hits * 1000 // len(toks) if toks else 0
    s_punct = ndot * 1000 // len(text) if text else 0
    return s_stop, s_punct, len(text)


def _write_docs(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for t, _ in rows],
            "lang": [lg for _, lg in rows],
            "source": "src0",
            "n_chars": [len(t) for t, _ in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return {
        r.scorer: (r.n_pos, r.n_neg, r.u2, r.auc, r.z_score)
        for r in auc_report(spark, sf).collect()
    }


def test_auc_planted_mirror(spark):
    # mixed corpus with real ties: punct-free texts, stopword densities and
    # lengths vary; only '.'-punctuation so the python mirror is exact
    rows = []
    for i in range(30):
        n_extra = i % 5
        words = ["the"] * (i % 3) + ["zz"] * (3 + n_extra)
        text = " ".join(words) + ("." * (i % 4))
        rows.append((text, "en" if i % 2 == 0 else "de"))
    tmp = _write_docs(rows)
    want = {}
    pairs = [( _scores(t), 1 if lg == "en" else 0) for t, lg in rows]
    for name, idx in (("stop_density", 0), ("punct_density", 1), ("len_chars", 2)):
        want[name] = _mw([(s[idx], y) for s, y in pairs])
    assert _collect(spark, tmp) == want


def test_auc_perfect_separation_and_all_tied(spark):
    # every en doc longer than every de doc -> len_chars AUC exactly 1.0;
    # stopword density identical everywhere (0) -> all-tied: auc 0.5, z NULL
    rows = [("z" * (200 + i), "en") for i in range(10)] + [
        ("z" * (50 + i), "de") for i in range(10)
    ]
    got = _collect(spark, _write_docs(rows))
    n1, n0, u2, auc, z = got["len_chars"]
    assert (n1, n0, auc) == (10, 10, 1.0) and z is not None and z > 0
    n1, n0, u2, auc, z = got["stop_density"]
    assert (auc, z) == (0.5, None) and u2 == 2 * n1 * n0 // 2  # U = n1*n0/2


def test_auc_single_class_null(spark):
    rows = [("w " * (i + 1), "de") for i in range(8)]
    got = _collect(spark, _write_docs(rows))
    for n1, n0, u2, auc, z in got.values():
        assert n1 == 0 and n0 == 8 and auc is None and z is None and u2 == 0


def test_auc_sf_bounds_determinism_plan(spark):
    a = sorted(tuple(r) for r in auc_report(spark, SF).collect())
    b = sorted(tuple(r) for r in auc_report(spark, SF).collect())
    assert a == b and len(a) == 3
    n_docs = pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    for r in auc_report(spark, SF).collect():
        assert r.n_pos + r.n_neg == n_docs
        assert r.auc is None or 0.0 <= r.auc <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(auc_report(spark, SF))
    # one scan fans to the 3-scorer stack in-row; counts combine map-side
    # into the bounded score domain; nothing drops to Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
