"""X63 passage chunking: python-model crosscheck (grid, overlap,
short-tail), coverage invariant, fuzz, and the shuffle-free plan."""

import io
from contextlib import redirect_stdout

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.chunking import chunk_documents

FAST = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_chunks(text, window, stride):
    toks = text.split(" ")
    n = len(toks)
    if n == 0:
        return []
    extra = (n - window + stride - 1) // stride if n > window else 0
    out = []
    for i in range(extra + 1):
        start = i * stride  # 0-based here
        piece = toks[start : start + window]
        out.append((i, start + 1, len(piece), " ".join(piece)))
    return out


def _run(spark, texts, window, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    rows = chunk_documents(df, "text", "doc_id", window, stride).collect()
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        )
    return {k: sorted(v) for k, v in got.items()}


def test_grid_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _run(spark, [text], window=4, stride=3)
    assert got[0] == _py_chunks(text, 4, 3)
    # chunks: starts 1,4,7 — the grid stops once the window reaches the
    # end (start 7 covers tokens 7-10; no degenerate tail chunk)
    assert [c[1] for c in got[0]] == [1, 4, 7]
    assert got[0][-1][2] == 4
    # overlap: each consecutive pair shares window - stride = 1 token
    for (_, s1, _, t1), (_, s2, _, t2) in zip(got[0], got[0][1:]):
        assert t1.split(" ")[s2 - s1 :] == t2.split(" ")[: 4 - (s2 - s1)]


def test_short_doc_single_chunk(spark):
    got = _run(spark, ["a b c"], window=10, stride=5)
    assert got[0] == [(0, 1, 3, "a b c")]


@settings(**FAST)
@given(
    n=st.integers(1, 40),
    window=st.integers(1, 12),
    stride=st.integers(1, 12),
)
def test_chunking_fuzz_matches_python_model(spark, n, window, stride):
    stride = min(stride, window)  # full-coverage regime
    text = " ".join(f"t{i}" for i in range(n))
    got = _run(spark, [text], window, stride)
    want = _py_chunks(text, window, stride)
    assert got[0] == want
    # coverage: every token index appears in some chunk
    covered = set()
    for _, start, ln, _ in want:
        covered |= set(range(start, start + ln))
    assert covered == set(range(1, n + 1))


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    ch = chunk_documents(df, "text", "doc_id", 3, 2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ch.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # chunking is row-local
    assert "Generate" in plan  # one explode of the start grid


def test_dotted_column_name(spark):
    # the grid arithmetic must come from column expressions, never from
    # interpolating the raw column name into SQL text
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    df = df.select("doc_id", F.col("text").alias("body.text"))
    ch = chunk_documents(df, "`body.text`", "doc_id", 3, 2).collect()
    assert [r.chunk_idx for r in ch] == [0, 1, 2]
    assert ch[2].chunk_text == "e f g"
