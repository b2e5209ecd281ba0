"""X49 tf-idf inverted-index cosine (operators/tfidf.py)."""

import math
import re
from collections import Counter


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _py_pairs(docs, max_df=None, top_k=100):
    """Independent pure-python model of the full quantized pipeline
    (ASCII fixtures so simple normalization matches normalize_for_scoring)."""
    toks = {}
    for i, d in enumerate(docs):
        t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", d.lower())).strip()
        toks[i] = t.split(" ") if t else []
    n = len(docs)
    tf = {i: Counter(w) for i, w in toks.items()}
    df = Counter(term for i in tf for term in tf[i])
    post = {}
    for i in tf:
        for term, c in tf[i].items():
            if max_df is not None and df[term] > max_df:
                continue
            idf_n9 = _round_half_up(math.log(float(n) / float(df[term])) * 1e9)
            wq = (c * idf_n9) // 10000
            if wq > 0:
                post.setdefault(i, {})[term] = wq
    ss = {i: sum(w * w for w in post[i].values()) for i in post}
    out = []
    for i in post:
        for j in post:
            if i >= j:
                continue
            shared = [t for t in post[i] if t in post[j] and df[t] >= 2]
            if not shared:
                continue
            dot = sum(post[i][t] * post[j][t] for t in shared)
            cos = round(dot / (math.sqrt(float(ss[i])) * math.sqrt(float(ss[j]))), 6)
            out.append((i, j, len(shared), float(dot), cos))
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    return out[:top_k]


DOCS = [
    "spark shuffles data between executors during wide transformations",
    "spark shuffles data between executors during wide transformations",  # exact dup of 0
    "the optimizer prunes columns and pushes filters into the scan",
    "executors spill to disk when the shuffle exceeds memory",
    "the the the the the common common words words here",
    "filters pushed into the scan skip whole row groups",
    "a completely unrelated sentence about gardening and tomato plants",
    "",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string"
    )


def test_tfidf_matches_python_model_exactly(spark):
    from ocr_output_evaluation_spark.operators.tfidf import tfidf_pair_topk

    got = [tuple(r) for r in tfidf_pair_topk(_df(spark), top_k=100).collect()]
    assert got == _py_pairs(DOCS)


def test_tfidf_duplicate_pair_ranks_first_with_cosine_one(spark):
    from ocr_output_evaluation_spark.operators.tfidf import tfidf_pair_topk

    top = tfidf_pair_topk(_df(spark), top_k=1).collect()[0]
    assert (top.id_a, top.id_b) == (0, 1)
    assert top.cosine == 1.0


def test_tfidf_max_df_drops_stop_terms(spark):
    """'the' (df > cap) must vanish from the vector space; the python model
    with the same cap must still match exactly."""
    from ocr_output_evaluation_spark.operators.tfidf import (
        tfidf_pair_topk,
        tfidf_postings,
    )

    terms = {
        r.term for r in tfidf_postings(_df(spark), max_df=3).select("term").collect()
    }
    assert "the" not in terms
    got = [tuple(r) for r in tfidf_pair_topk(_df(spark), max_df=3, top_k=100).collect()]
    assert got == _py_pairs(DOCS, max_df=3)


def test_tfidf_plan_shape(spark):
    """Inverted-index shape: hash joins only (no nested-loop pairing), the
    tf frame collapses map-side before any exchange, top-k is a
    TakeOrderedAndProject."""
    from ocr_output_evaluation_spark.operators.tfidf import tfidf_pair_topk
    from tests.test_plans import n_nodes, plan_of

    plan = plan_of(tfidf_pair_topk(_df(spark), top_k=15))
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join: the sanctioned 1-row n_docs broadcast
    # attach onto the vocabulary frame — never the doc-pairing leg. The
    # persisted postings frame collapses all four reuse legs onto one
    # InMemoryRelation, so the attach (and the tokenize scan) appear once.
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert n_nodes(plan, "TakeOrderedAndProject") == 1
    assert plan.count("InMemoryTableScan") >= 4
    assert n_nodes(plan, "HashAggregate") >= 6
