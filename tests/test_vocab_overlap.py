"""X125 cross-source vocabulary overlap (queries.vocab_overlap_report):
exact-count python mirror with its own normalizer, disjoint sources
jaccard=0, identical sources jaccard=1, subset source overlap_coef=1
with jaccard<1, duplicate tokens counted once, normalization folds
case/punct, determinism + symmetry-free ordered-pair invariants, plan
pins. DuckDB value identity is the oracle gate's job
(ORACLE_VOCAB_OVERLAP)."""

from __future__ import annotations

import os
import re
import tempfile
from itertools import combinations

import pandas as pd

from ocr_output_evaluation_spark.queries import vocab_overlap_report

SF = "/root/testdata/sf0.001"


def _vocab(texts):
    """Mirror normalize_for_scoring for the ASCII fixtures: lowercase,
    keep letters+space, collapse whitespace, split."""
    out = set()
    for t in texts:
        norm = re.sub(r"[^a-z ]+", " ", t.lower())
        norm = re.sub(r"\s+", " ", norm).strip()
        if norm:
            out.update(norm.split(" "))
    return out


def _mirror(rows):
    by = {}
    for s, t in rows:
        by.setdefault(s, []).append(t)
    voc = {s: _vocab(ts) for s, ts in by.items()}
    out = []
    for a, b in combinations(sorted(voc), 2):
        inter = len(voc[a] & voc[b])
        if inter == 0:
            continue  # inner join drops empty intersections
        union = len(voc[a]) + len(voc[b]) - inter
        out.append(
            dict(
                source_a=a,
                source_b=b,
                v_a=len(voc[a]),
                v_b=len(voc[b]),
                n_common=inter,
                jaccard=round(inter / union, 6),
                overlap_coef=round(inter / min(len(voc[a]), len(voc[b])), 6),
            )
        )
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for _, t in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [len(t) for _, t in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in vocab_overlap_report(spark, sf).collect()]


def test_vocab_identical_sources(spark):
    rows = [("a", "red fox jumps"), ("b", "red fox jumps"), ("b", "red fox")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["jaccard"] == 1.0 and got[0]["overlap_coef"] == 1.0


def test_vocab_subset_source(spark):
    # b's vocab is a strict subset of a's: overlap_coef = 1, jaccard < 1
    rows = [("a", "one two three four"), ("b", "two three")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["overlap_coef"] == 1.0 and got[0]["jaccard"] == 0.5


def test_vocab_disjoint_dropped(spark):
    # zero intersection -> pair row absent (inner join)
    rows = [("a", "alpha beta"), ("b", "gamma delta"), ("c", "alpha gamma")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    pairs = {(r["source_a"], r["source_b"]) for r in got}
    assert ("a", "b") not in pairs
    assert ("a", "c") in pairs and ("b", "c") in pairs


def test_vocab_dedup_and_normalization(spark):
    # repeats count once; case and punctuation fold away
    rows = [("a", "Fox! fox FOX fox."), ("b", "fox")]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["v_a"] == 1 and got[0]["n_common"] == 1
    assert got[0]["jaccard"] == 1.0


def test_vocab_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    for r in a:
        assert r["source_a"] < r["source_b"]
        assert r["n_common"] <= min(r["v_a"], r["v_b"])
        assert 0 < r["jaccard"] <= r["overlap_coef"] <= 1
    from tests.test_plans import plan_of

    plan = plan_of(vocab_overlap_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "BroadcastHashJoin" in plan
