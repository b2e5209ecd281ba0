"""X39 DSIR importance resampling (operators/dsir.py): pure-Python model
crosschecks (exact integer nano-log parity), Gumbel-selection equivalence,
the distribution-tilt property the operator exists for, and the plan pins
(no SortMergeJoin, broadcast LM, TakeOrderedAndProject, no Python UDFs)."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.dsir import (
    GUMBEL_SALT,
    dsir_log_weights,
    dsir_select,
)

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _model_nano(texts: dict[int, str], target: set[int], B: int) -> dict[int, int]:
    """Pure-Python replay: hashed unigram+bigram occurrence counts, add-1
    smoothed target/raw bucket LMs, integer nano-log weight per doc."""
    occ: list[tuple[int, int]] = []  # (doc, bucket)
    for d, t in texts.items():
        toks = t.split()
        grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        occ += [(d, _h32(g) % B) for g in grams]
    raw = [0] * B
    tgt = [0] * B
    for d, b in occ:
        raw[b] += 1
        if d in target:
            tgt[b] += 1
    totr, tott = sum(raw), sum(tgt)
    r = [
        int(round((math.log((tgt[b] + 1.0) / (tott + B))
                   - math.log((raw[b] + 1.0) / (totr + B))) * 1e9))
        for b in range(B)
    ]
    nano = {d: 0 for d in texts}
    for d, b in occ:
        nano[d] += r[b]
    return nano


def _model_score(doc_id: int, nano: int) -> float:
    u = (_h32(f"{GUMBEL_SALT}{doc_id}") + 0.5) / 4294967296.0
    return nano / 1e9 + (-math.log(-math.log(u)))


@settings(**FAST)
@given(
    texts=st.dictionaries(
        st.integers(0, 40),
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=15,
    ),
    tmod=st.integers(2, 5),
    B=st.sampled_from([8, 32]),
)
def test_log_weights_match_python_model(spark, texts, tmod, B):
    target = {d for d in texts if d % tmod == 0}
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: r._nano
        for r in dsir_log_weights(
            df, F.col("doc_id") % tmod == 0, "text", "doc_id", n_buckets=B
        ).collect()
    }
    assert got == _model_nano(texts, target, B)


def test_select_matches_python_model_and_is_deterministic(spark):
    texts = {
        d: " ".join(WORDS[(d * 7 + i) % len(WORDS)] for i in range(10))
        for d in range(30)
    }
    texts[13] = ""  # token-free docs must still be rankable (logw = 0)
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    tgt = F.col("doc_id") < 5
    sel = dsir_select(df, tgt, "text", "doc_id", k=12, n_buckets=16)
    got = [(r.doc_id, r._nano) for r in sel.collect()]
    again = [(r.doc_id, r._nano) for r in sel.collect()]
    assert got == again  # md5 noise, no RNG: re-runs identical

    nano = _model_nano(texts, {d for d in texts if d < 5}, 16)
    want = sorted(
        texts, key=lambda d: (-_model_score(d, nano[d]), d)
    )[:12]
    assert [d for d, _ in got] == want
    assert dict(got) == {d: nano[d] for d in want}


def test_selection_tilts_toward_target_distribution(spark):
    """The point of DSIR: docs resembling the target's gram distribution are
    over-represented in the selection relative to their corpus share."""
    rows = []
    for d in range(200):
        style = "a" if d % 4 == 0 else "b"  # style-a = 25% of the corpus
        words = (
            ["alpha", "beta", "gamma"] if style == "a" else ["omega", "psi", "chi"]
        )
        rows.append((d, style, " ".join(words[(d + i) % 3] for i in range(8))))
    df = spark.createDataFrame(rows, "doc_id long, style string, text string")
    # target: a slice of the style-a docs — selection should tilt toward 'a'
    sel = dsir_select(
        df, (F.col("doc_id") % 16 == 0), "text", "doc_id", k=40, n_buckets=32
    )
    share = (
        df.join(sel.select("doc_id"), "doc_id")
        .filter(F.col("style") == "a")
        .count()
    ) / 40.0
    assert share > 0.6, f"selected style-a share {share} not tilted above 25%"


def test_dsir_plan_shape(spark, sf_dir):
    """No SortMergeJoin anywhere (LM + selection joins broadcast), the
    selection is a TakeOrderedAndProject (never a global sort), and the
    whole path stays on codegen (no Python eval nodes)."""
    from ocr_output_evaluation_spark.queries import dsir_selection_report
    from tests.test_plans import n_nodes, plan_of

    plan = plan_of(dsir_selection_report(spark, sf_dir))
    assert n_nodes(plan, "SortMergeJoin") == 0
    assert n_nodes(plan, "TakeOrderedAndProject") == 1
    assert n_nodes(plan, "BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_inrow_scoring_matches_weights_and_streams(spark, sf_dir, tmp_path):
    """with_dsir_logw (the in-row, shuffle-free form) must produce the
    exact integer nano sums of dsir_log_weights — and, applied to a
    Structured Stream, score arriving docs identically to batch."""
    from ocr_output_evaluation_spark.fixtures.generate import web_pages_df
    from ocr_output_evaluation_spark.operators.dsir import (
        dsir_log_ratio_list,
        with_dsir_logw,
    )
    from ocr_output_evaluation_spark.streaming import read_web_pages_stream

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = F.col("source") == "src0"
    r = dsir_log_ratio_list(d, tgt, "text", "doc_id", n_buckets=64)
    assert len(r) == 64
    inrow = {
        x.doc_id: x.dsir_logw_nano
        for x in with_dsir_logw(d, r, "text").select("doc_id", "dsir_logw_nano").collect()
    }
    agg = {
        x.doc_id: x._nano
        for x in dsir_log_weights(d, tgt, "text", "doc_id", n_buckets=64).collect()
    }
    assert inrow == agg

    # streaming leg: same expression over a file stream == batch scores
    src = str(tmp_path / "pages")
    web_pages_df(spark, 80, 4).write.parquet(src)
    pages = spark.read.parquet(src)
    r2 = dsir_log_ratio_list(pages, F.col("lang") == "en", "text", "url", n_buckets=32)
    q = (
        with_dsir_logw(read_web_pages_stream(spark, src), r2, "text")
        .select("url", "dsir_logw_nano")
        .writeStream.format("memory")
        .queryName("dsir_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        x.url: x.dsir_logw_nano
        for x in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    want = {
        x.url: x.dsir_logw_nano
        for x in with_dsir_logw(pages, r2, "text").select("url", "dsir_logw_nano").collect()
    }
    assert got == want and len(got) == 80
