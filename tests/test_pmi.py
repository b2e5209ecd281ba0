"""X50 PMI collocation mining (operators/pmi.py)."""

import io
import math
import re
from collections import Counter
from contextlib import redirect_stdout


def _py_pmi(docs, min_count):
    """Independent pure-python model (ASCII fixtures, so the simple
    lowercase/letters-only normalization matches normalize_for_scoring)."""
    uni, pairs = Counter(), Counter()
    T = B = 0
    for d in docs:
        t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", d.lower())).strip()
        w = t.split(" ") if t else []
        uni.update(w)
        pairs.update(zip(w, w[1:]))
        T += len(w)
        B += max(len(w) - 1, 0)
    out = []
    for (w1, w2), c12 in pairs.items():
        if c12 < min_count:
            continue
        pmi = math.log(
            ((float(c12) * float(T)) * float(T))
            / ((float(B) * float(uni[w1])) * float(uni[w2]))
        )
        out.append((w1, w2, c12, uni[w1], uni[w2], round(pmi, 6)))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "new york is not the same as new jersey",
    "new york new york so good they named it twice",
    "machine learning on big data needs big machines",
    "the dog saw the dog chase the fox in new york",
    "big data big data big data pipelines",
    "",
    "a b a b a b a b",
]


def test_pmi_matches_python_model_exactly(spark):
    from ocr_output_evaluation_spark.operators.pmi import pmi_collocations

    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    got = [tuple(r) for r in pmi_collocations(df, min_count=2, top_k=100).collect()]
    assert got == _py_pmi(DOCS, min_count=2)


def test_pmi_collocation_beats_frequent_pair(spark):
    """'new york' (always adjacent) must outrank 'the dog' (frequent words,
    rarely adjacent) — the property PMI exists to capture, independent of
    raw pair frequency."""
    from ocr_output_evaluation_spark.operators.pmi import pmi_collocations

    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    rows = {(r.w1, r.w2): r.pmi for r in pmi_collocations(df, min_count=2, top_k=100).collect()}
    assert rows[("new", "york")] > rows[("the", "dog")]


def test_pmi_min_count_prunes_hapax(spark):
    from ocr_output_evaluation_spark.operators.pmi import pmi_collocations

    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    got = pmi_collocations(df, min_count=2, top_k=100).collect()
    assert all(r.c12 >= 2 for r in got)
    assert ("quick", "brown") not in {(r.w1, r.w2) for r in got}


def test_pmi_plan_shape(spark):
    """The count frames must finish map-side (partial HashAggregate before
    every exchange) and the totals frame must broadcast — the corpus never
    shuffles instances, only vocabulary-scale frames."""
    from ocr_output_evaluation_spark.operators.pmi import pmi_collocations
    from tests.test_plans import n_nodes, plan_of

    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    plan = plan_of(pmi_collocations(df, min_count=2, top_k=20))
    # explode feeds a partial agg, never a raw exchange: every
    # hashpartitioning exchange sits above a HashAggregate
    assert n_nodes(plan, "HashAggregate") >= 6  # 3 aggs x partial+final
    assert "BroadcastExchange" in plan  # totals frame
    assert n_nodes(plan, "TakeOrderedAndProject") == 1
