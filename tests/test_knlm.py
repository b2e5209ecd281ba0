"""X51 interpolated Kneser-Ney bigram LM (operators/knlm.py)."""

import math
import re
from collections import Counter, defaultdict

D = 0.75


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _py_model(docs):
    """Independent pure-python interpolated-KN bigram model (ASCII
    fixtures). Returns (pairs {(v,w): c}, P fn over the full continuation
    vocab, nano table {(v,w): nano_logp} for seen pairs)."""
    bigrams = Counter()
    for d in docs:
        t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", d.lower())).strip()
        w = t.split(" ") if t else []
        bigrams.update(zip(w, w[1:]))
    c_v = defaultdict(int)
    n1p_v = defaultdict(int)
    n1ctx_w = defaultdict(int)
    for (v, w), c in bigrams.items():
        c_v[v] += c
        n1p_v[v] += 1
        n1ctx_w[w] += 1
    n_types = len(bigrams)

    def prob(v, w):
        disc = max(float(bigrams.get((v, w), 0)) - D, 0.0) / float(c_v[v])
        lam = D * float(n1p_v[v]) / float(c_v[v])
        return disc + lam * (float(n1ctx_w[w]) / float(n_types))

    nano = {
        (v, w): _round_half_up(math.log10(prob(v, w)) * 1e9) for (v, w) in bigrams
    }
    return bigrams, prob, nano, n1ctx_w


DOCS = [
    "san francisco is in california",
    "san francisco san francisco san francisco san francisco",
    "the car and a car and one car drove",
    "the francisco anomaly",
    "san francisco traffic needs a car",
    "",
]


def test_kn_table_matches_python_model_exactly(spark):
    from ocr_output_evaluation_spark.operators.knlm import train_kn_bigram

    df = spark.createDataFrame(
        [(i, d, "en") for i, d in enumerate(DOCS)], "doc_id long, text string, lang string"
    )
    got = {
        (r.v, r.w): (r.c_vw, r.nano_logp) for r in train_kn_bigram(df).collect()
    }
    bigrams, _, nano, _ = _py_model(DOCS)
    assert got == {k: (bigrams[k], nano[k]) for k in bigrams}


def test_kn_sums_to_one_per_context():
    """Interpolated KN's defining identity: for every context v, the
    probabilities over the continuation vocabulary sum to exactly 1
    (discounted mass (c_v - D*N1p)/c_v plus lam(v) * sum(Pcont) = 1)."""
    bigrams, prob, _, n1ctx = _py_model(DOCS)
    vocab = list(n1ctx)
    for v in {v for (v, _) in bigrams}:
        assert abs(sum(prob(v, w) for w in vocab) - 1.0) < 1e-9


def test_kn_continuation_demotes_glued_words(spark):
    """The 'francisco' property: 'francisco' is far more FREQUENT than
    'car' (c=5 vs 3) but follows essentially one context, so with equal
    evidence after 'the' (c(the,car) = c(the,francisco) = 1, same c_v)
    KN must score P(car|the) > P(francisco|the). A raw-frequency
    interpolation would order them the other way."""
    from ocr_output_evaluation_spark.operators.knlm import train_kn_bigram

    df = spark.createDataFrame(
        [(i, d, "en") for i, d in enumerate(DOCS)], "doc_id long, text string, lang string"
    )
    t = {(r.v, r.w): r.nano_logp for r in train_kn_bigram(df).collect()}
    assert t[("the", "car")] > t[("the", "francisco")]


def test_kn_doc_scores_match_python_model(spark):
    from ocr_output_evaluation_spark.operators.knlm import (
        kn_doc_scores,
        train_kn_bigram,
    )

    df = spark.createDataFrame(
        [(i, d, "en") for i, d in enumerate(DOCS)], "doc_id long, text string, lang string"
    )
    lm = train_kn_bigram(df)
    got = {r.doc_id: (r.n_bigrams, r.ppl) for r in kn_doc_scores(df, lm).collect()}
    _, _, nano, _ = _py_model(DOCS)
    want = {}
    for i, d in enumerate(DOCS):
        t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", d.lower())).strip()
        w = t.split(" ") if t else []
        pairs = list(zip(w, w[1:]))
        if not pairs:
            continue  # the NULL class: no bigrams -> absent
        s = sum(nano[p] for p in pairs)
        want[i] = (len(pairs), round(10.0 ** (-(s / 1e9) / len(pairs)), 2))
    assert got == want
    assert 5 not in got  # empty doc dropped


def test_kn_plan_shape(spark):
    """Training statistics are windows over the aggregated TYPE frame —
    the corpus explodes once per pass and collapses map-side; no
    cartesian products anywhere."""
    from ocr_output_evaluation_spark.operators.knlm import train_kn_bigram
    from tests.test_plans import n_nodes, plan_of

    df = spark.createDataFrame(
        [(i, d, "en") for i, d in enumerate(DOCS)], "doc_id long, text string, lang string"
    )
    plan = plan_of(train_kn_bigram(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert n_nodes(plan, "Generate") == 1  # one explode
    assert n_nodes(plan, "HashAggregate") >= 2  # partial + final type counts
