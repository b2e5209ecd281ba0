"""X48 BM25 retrieval scoring (operators/bm25.py)."""

import io
import math
from contextlib import redirect_stdout

from pyspark.sql import functions as F

DOCS = {
    1: "hash join stream vector hash hash",
    2: "hash table scan filter sort",
    3: "stream stream stream window agg",
    4: "sort merge scan filter window agg key",
    5: "vector join vector join hash",
    6: "",
    7: "the a of",
}
TERMS = ["hash", "join", "stream", "vector"]


def _py_bm25(docs, terms):
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    tot = sum(len(w) for w in toks.values())
    avgdl = float(tot) / float(n)
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = float(w.count(t))
            idf = math.log(
                (float(n - df[t]) + 0.5) / (float(df[t]) + 0.5) + 1.0
            )
            s = s + idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (float(len(w)) / avgdl)))
        out[i] = (len(w), sum(1 for t in terms if t in w), s)
    return out


def test_bm25_matches_python_model(spark):
    """Formula crosscheck vs an independent pure-python BM25 with the
    same operand order: dl and matched-term counts exact, scores equal
    at the 6 dp the report rounds to (the only engine-variant op is ln,
    <= 1 ulp)."""
    from ocr_output_evaluation_spark.operators.bm25 import bm25_scored

    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["dl"], r["n_terms_matched"], r["_bm25"])
        for r in bm25_scored(df, "text", "doc_id", TERMS).collect()
    }
    want = _py_bm25(DOCS, TERMS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == want[i][1]
        assert round(got[i][2], 6) == round(want[i][2], 6), (i, got[i], want[i])


def test_bm25_ordering_semantics(spark):
    """Sanity on the ranking: the all-terms doc with repeated hits (1)
    outranks single-topic docs; docs with zero query terms score exactly
    0.0; rarer terms weigh more (doc 3, three hits of the rarest
    multi-doc term, beats doc 2's single common-term hit)."""
    from ocr_output_evaluation_spark.operators.bm25 import bm25_scored

    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id int, text string"
    )
    s = {
        r["doc_id"]: r["_bm25"]
        for r in bm25_scored(df, "text", "doc_id", TERMS).collect()
    }
    assert s[1] > s[2] and s[1] > s[3]
    assert s[6] == 0.0 and s[7] == 0.0 and s[4] == 0.0
    assert s[3] > s[2]


def test_bm25_report_plan_shape(spark, sf_dir):
    """Plan pin for the 100 TB shape: scoring is entirely in-row — no
    join and no explode (Generate) anywhere — and the top-10 is a
    TakeOrderedAndProject, never a global sort."""
    from ocr_output_evaluation_spark.queries import bm25_search_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        bm25_search_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan
