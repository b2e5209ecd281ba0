"""X84 domain concentration (Gini + HHI) + X85 per-source Jensen-Shannon
divergence (queries.domain_concentration_report /
domain_divergence_report): exact python-mirror value identity on the
sf0.001 fixture corpus, bounds, determinism, and plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_DOMAIN_CONCENTRATION /
ORACLE_DOMAIN_DIVERGENCE)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    domain_concentration_report,
    domain_divergence_report,
)
from tests.test_corpus_stats import _tokens

SF = "/root/testdata/sf0.001"
LN2 = 0.6931471805599453


def test_domain_concentration_python_mirror(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    counts = Counter(docs["source"])
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n, tot = len(xs), sum(c for _, c in xs)
    six = sum(i * c for i, (_, c) in enumerate(xs, 1))
    sxx = sum(c * c for _, c in xs)
    gini = round((2 * six - (n + 1) * tot) / (n * tot), 6)
    hhi = round(sxx / (tot * tot), 6)
    top_x, top_source = max((c, s) for s, c in xs)
    row = domain_concentration_report(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_sources, r.n_docs, r.gini, r.hhi, r.top_source, r.top_share) == (
        n, tot, gini, hhi, top_source, round(top_x / tot, 6)
    )
    # Gini and HHI live in [0, 1); HHI is at least 1/n (uniform floor)
    assert 0.0 <= r.gini < 1.0 and (1.0 / n) - 1e-9 <= r.hhi < 1.0


def test_domain_divergence_python_mirror(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
    sc: dict[str, Counter] = defaultdict(Counter)
    for source, text in zip(docs["source"], docs["text"]):
        sc[source].update(_tokens(text))
    sc = {s: c for s, c in sc.items() if c}
    gc: Counter = Counter()
    for c in sc.values():
        gc.update(c)
    n_corpus = sum(gc.values())
    expected = {}
    for s, c in sc.items():
        n_tok = sum(c.values())
        sn = 0
        for w, cs in c.items():
            p = cs / n_tok
            q = gc[w] / n_corpus
            contrib = (
                0.5 * p * math.log(2.0 * p / (p + q))
                + 0.5 * q * math.log(2.0 * q / (p + q))
                - 0.5 * LN2 * q
            )
            sn += round(contrib * 1e9)
        js = sn / 1e9 + 0.5 * LN2
        expected[s] = (n_tok, len(c), round(js, 6), round(js / LN2, 6))
    rows = domain_divergence_report(spark, SF).collect()
    assert [r.source for r in rows] == sorted(expected)
    for r in rows:
        assert (r.n_tokens, r.n_types, r.js_nats, r.js_norm) == expected[r.source]
        # JS is bounded by ln 2; normalized form in [0, 1]
        assert -1e-6 <= r.js_norm <= 1.0 and -1e-6 <= r.js_nats <= LN2 + 1e-6


def test_domain_divergence_identical_dist_is_zero(spark, tmp_path):
    # a corpus where every source has the SAME word distribution → JS ~ 0
    # for every source (only nano-quantization residue)
    rows = []
    for i in range(300):
        rows.append(
            {"doc_id": i, "source": f"s{i % 3}", "lang": "en",
             "text": "alpha beta beta gamma gamma gamma"}
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = domain_divergence_report(spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert abs(r.js_nats) < 1e-5


def test_domain_stats_plans_and_determinism(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in domain_divergence_report(spark, SF).collect()]
    b = [tuple(r) for r in domain_divergence_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(domain_divergence_report(spark, SF))
    # the count frame persists (fans into corpus counts / source totals /
    # the contribution join); source totals + grand total broadcast;
    # nothing drops to Python
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan2 = plan_of(domain_concentration_report(spark, SF))
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2
