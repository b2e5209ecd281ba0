"""X66 weighted blocklist tagging: hand-computed fixture, zero-hit/empty-doc
survival, threshold semantics, python-mirror fuzz, and the
broadcast/one-exchange plan pin."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.blocklist import blocklist_tag

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

TERMS = [("bad", 1), ("worse", 2), ("awful", 4)]
VOCAB = ["good", "fine", "bad", "worse", "awful", "ok"]


def _terms_df(spark):
    return spark.createDataFrame(TERMS, "term string, weight long")


def _run(spark, docs, threshold=4):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_hits, r.n_terms, r.score, r.flagged)
        for r in blocklist_tag(
            d, "text", "doc_id", _terms_df(spark), threshold=threshold
        ).collect()
    }


def _py(docs, threshold=4):
    w = dict(TERMS)
    out = {}
    for i, t in enumerate(docs):
        toks = [x for x in t.split() if x]
        hits = [x for x in toks if x in w]
        score = sum(w[x] for x in hits)
        out[i] = (len(hits), len(set(hits)), score, int(score >= threshold))
    return out


def test_hand_fixture(spark):
    docs = [
        "bad bad worse good",  # hits 3, terms 2, score 4 -> flagged
        "good fine ok",  # clean
        "",  # empty: survives with zeros
        "awful",  # score 4 -> flagged
    ]
    got = _run(spark, docs)
    assert got == {
        0: (3, 2, 4, 1),
        1: (0, 0, 0, 0),
        2: (0, 0, 0, 0),
        3: (1, 1, 4, 1),
    }


@settings(**FAST)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=20).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    threshold=st.integers(1, 8),
)
def test_fuzz_matches_python(spark, docs, threshold):
    assert _run(spark, docs, threshold) == _py(docs, threshold)


def test_plan_broadcast_no_corpus_joinback(spark):
    from tests.test_plans import n_nodes, plan_of

    d = spark.createDataFrame([(0, "bad good")], "doc_id long, text string")
    plan = plan_of(blocklist_tag(d, "text", "doc_id", _terms_df(spark)))
    assert n_nodes(plan, "BroadcastHashJoin") == 1
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "Exchange") <= 2  # groupBy + broadcast, never more
