"""X69 Moore-Lewis cross-entropy difference selection
(operators/moorelewis.py): pure-Python model crosscheck (exact integer
nano parity), the domain-tilt property the method exists for, class
semantics (no-text NULL, unknown-lang +inf), selection order, and the
plan pins (broadcast diff table, TakeOrderedAndProject, no Python UDFs)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.moorelewis import (
    moore_lewis_scores,
    moore_lewis_select,
)
from ocr_output_evaluation_spark.operators.perplexity import (
    normalize_text_py,
    train_char_lm,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

WORDS = ["mountain", "river", "spark", "table", "query", "shuffle", "zot"]


def _grams(t: str) -> list[str]:
    n = normalize_text_py(t)
    return [n[i : i + 3] for i in range(len(n) - 2)] if len(n) >= 3 else []


def _lm(texts: list[str]) -> dict[str, float]:
    c: dict[str, int] = {}
    for t in texts:
        for g in _grams(t):
            c[g] = c.get(g, 0) + 1
    tot, vocab = sum(c.values()), len(c)
    return {g: math.log10((k + 1.0) / (tot + vocab)) for g, k in c.items()}


def _model(seed: list[str], pool: dict[int, str]) -> dict[int, tuple[int, int]]:
    """-> {doc: (n_grams, ml_nano)} over scoreable pool docs."""
    li, lo = _lm(seed), _lm(list(pool.values()))
    dn = {
        g: int(round((lo.get(g, -6.0) - li.get(g, -6.0)) * 1e9))
        for g in set(li) | set(lo)
    }
    out = {}
    for d, t in pool.items():
        gs = _grams(t)
        out[d] = (len(gs), sum(dn.get(g, 0) for g in gs))
    return out


def _frames(spark, seed, pool):
    rows = [(-(i + 1), "en", t) for i, t in enumerate(seed)] + [
        (d, "en", t) for d, t in pool.items()
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    lm_in = train_char_lm(df.filter(F.col("doc_id") < 0), text_col="text")
    lm_out = train_char_lm(df.filter(F.col("doc_id") >= 0), text_col="text")
    return df.filter(F.col("doc_id") >= 0), lm_in, lm_out


@settings(**FAST)
@given(
    seed=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    pool=st.dictionaries(
        st.integers(0, 30),
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=10,
    ),
)
def test_scores_match_python_model(spark, seed, pool):
    docs, lm_in, lm_out = _frames(spark, seed, pool)
    got = {
        r.doc_id: (r.n_grams, r.ml_nano, r.ml_score)
        for r in moore_lewis_scores(docs, lm_in, lm_out).collect()
    }
    want = _model(seed, pool)
    assert set(got) == set(want)
    for d, (n, nano) in want.items():
        assert got[d][0] == n
        assert got[d][1] == nano, f"doc {d}: {got[d][1]} != {nano}"
        assert got[d][2] == nano / (1e9 * n)


def test_domain_tilt(spark):
    """The method's reason to exist: among pool docs of equal length, the
    one written in the seed's vocabulary must outrank (score lower than)
    the one written in disjoint vocabulary."""
    seed = ["mountain river mountain river mountain"] * 3
    pool = {
        1: "mountain river mountain river",
        2: "shuffle query shuffle query",
        3: "table spark table spark",
    }
    docs, lm_in, lm_out = _frames(spark, seed, pool)
    s = {r.doc_id: r.ml_score for r in moore_lewis_scores(docs, lm_in, lm_out).collect()}
    assert s[1] < s[2] and s[1] < s[3]
    top = moore_lewis_select(docs, lm_in, lm_out, k=1).collect()
    assert top[0].doc_id == 1


def test_class_semantics(spark):
    seed = ["mountain river"]
    pool = {1: "mountain pass", 2: "", 3: "xy"}
    docs, lm_in, lm_out = _frames(spark, seed, pool)
    rows = {r.doc_id: r for r in moore_lewis_scores(docs, lm_in, lm_out).collect()}
    # no scoreable text -> NULL score, zero grams
    assert rows[2].ml_score is None and rows[2].n_grams == 0
    assert rows[3].ml_score is None  # < 3 chars after normalization
    assert rows[1].ml_score is not None and math.isfinite(rows[1].ml_score)
    # lang absent from the in-domain LM -> +inf (unrankable), never selected
    fr = docs.sparkSession.createDataFrame(
        [(9, "fr", "mountain river mountain")], "doc_id long, lang string, text string"
    )
    both = docs.unionByName(fr)
    got = {r.doc_id: r.ml_score for r in moore_lewis_scores(both, lm_in, lm_out).collect()}
    assert got[9] == float("inf")
    sel = moore_lewis_select(both, lm_in, lm_out, k=3).collect()
    assert [r.doc_id for r in sel] and 9 not in {r.doc_id for r in sel[:1]}
    # NULL/no-text sorts last: with k covering all finite docs, doc 2/3
    # appear only after every finite score
    order = [r.doc_id for r in moore_lewis_select(both, lm_in, lm_out, k=5).collect()]
    assert order.index(1) < order.index(2) and order.index(1) < order.index(9)


def test_plan_pins(spark):
    from tests.test_plans import n_nodes, plan_of

    seed = ["mountain river"] * 2
    pool = {i: "spark table query" for i in range(6)}
    docs, lm_in, lm_out = _frames(spark, seed, pool)
    sel = moore_lewis_select(docs, lm_in, lm_out, k=3)
    plan = plan_of(sel)
    # scoring joins (diff table + the two known-lang frames) all broadcast
    assert n_nodes(plan, "BroadcastHashJoin") >= 3
    # selection is a heap top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
