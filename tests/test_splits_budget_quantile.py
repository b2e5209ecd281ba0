"""Splits, token-budget sampling, exact quantile gates (r3 wave-3
training-data ops). The report queries are DuckDB-oracle-checked
end-to-end by the driver; these tests pin the operator semantics the
oracle can't see — group-atomicity, equivalence of the two-phase forms
to their naive definitions, tie rules — plus the plan shapes that make
them 100 TB-safe (no per-lang corpus window, broadcast thresholds)."""

import io
import math
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import Window as W, functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# assign_split
# ---------------------------------------------------------------------------
def test_split_group_atomic_and_deterministic(spark, sf_dir):
    from ocr_output_evaluation_spark.operators.splits import assign_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Keyed on the GROUP column: every source lands in exactly one split.
    by_group = assign_split(docs, "source")
    assert (
        by_group.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") != 1)
        .count()
        == 0
    )
    # Pure function of the key: a re-run assigns identically.
    a = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
    assert a == b and set(a.values()) <= {"train", "val", "test"}


def test_split_proportions_converge(spark):
    from ocr_output_evaluation_spark.operators.splits import assign_split

    n = 20_000
    df = assign_split(spark.range(n).withColumnRenamed("id", "k"), "k")
    got = {r.split: r["count"] for r in df.groupBy("split").count().collect()}
    assert abs(got["train"] / n - 0.80) < 0.02
    assert abs(got["val"] / n - 0.10) < 0.02
    assert abs(got["test"] / n - 0.10) < 0.02


def test_split_salt_decorrelates_and_validates(spark):
    from ocr_output_evaluation_spark.operators.splits import assign_split

    df = spark.range(2_000).withColumnRenamed("id", "k")
    a = assign_split(df, "k", salt="v1", out_col="s1")
    both = assign_split(a, "k", salt="v2", out_col="s2")
    moved = both.filter(F.col("s1") != F.col("s2")).count()
    assert moved > 0  # different salt => a different (still deterministic) split
    with pytest.raises(ValueError):
        assign_split(df, "k", fractions=(("train", 80), ("val", 30)))


def test_split_is_scan_side_expression(spark, sf_dir):
    """The assignment adds NO exchange: a filter on the split column plans
    as scan -> project/filter with zero Exchange nodes."""
    from ocr_output_evaluation_spark.operators.splits import assign_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(assign_split(docs, "doc_id").filter(F.col("split") == "val"))
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# token_budget_take
# ---------------------------------------------------------------------------
def _naive_budget(df, budget):
    """The one-window-per-lang definition the operator must match."""
    from ocr_output_evaluation_spark.functions.text import (
        whitespace_token_count,
    )

    w = (
        W.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    tok = whitespace_token_count(F.col("text"))
    return df.withColumn("kept", F.sum(tok).over(w) <= budget)


def test_token_budget_matches_naive_window(spark, sf_dir):
    from ocr_output_evaluation_spark.functions.text import (
        whitespace_token_count,
    )
    from ocr_output_evaluation_spark.operators.budget import token_budget_take

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for budget in (0, 37, 500, 10**9):
        got = {
            r.doc_id
            for r in token_budget_take(
                docs, whitespace_token_count(F.col("text")), "doc_id", budget
            )
            .filter("kept")
            .collect()
        }
        want = {
            r.doc_id for r in _naive_budget(docs, budget).filter("kept").collect()
        }
        assert got == want, f"budget={budget}"


def test_token_budget_kept_set_is_hash_prefix(spark, sf_dir):
    """take-while semantics: the kept set is exactly a prefix of the
    group's md5 order — no kept row sorts after a dropped one."""
    from ocr_output_evaluation_spark.functions.text import (
        whitespace_token_count,
    )
    from ocr_output_evaluation_spark.operators.budget import token_budget_take

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = token_budget_take(
        docs, whitespace_token_count(F.col("text")), "doc_id", 400
    ).select(
        "lang", "kept", F.md5(F.col("doc_id").cast("string")).alias("k")
    ).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.k, r.kept))
    for lang, pairs in by_lang.items():
        pairs.sort()
        keptness = [k for _, k in pairs]
        assert keptness == sorted(keptness, reverse=True), lang


def test_token_budget_windows_are_bucket_local(spark, sf_dir):
    """Scale pin: no window partitions on lang alone — every corpus-side
    window partitioning includes the _bkt column, so the widest sort
    partition is 1/256th of a language."""
    from ocr_output_evaluation_spark.functions.text import (
        whitespace_token_count,
    )
    from ocr_output_evaluation_spark.operators.budget import token_budget_take

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_budget_take(
        docs, whitespace_token_count(F.col("text")), "doc_id", 400
    ).filter("kept")
    plan = plan_of(out)
    # Every window partition spec in the plan must include the bucket key;
    # a bare [lang] partitioning is the one-task-per-language trap.
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    corpus_specs = [s for s in specs if "_bkt_tokens" not in s]
    assert corpus_specs and all("_bkt" in s for s in corpus_specs), specs
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# quantile_gate
# ---------------------------------------------------------------------------
def test_quantile_gate_matches_naive_rank(spark, sf_dir):
    """Histogram threshold == the naive percent-rank definition, for a
    sweep of fractions (tie-inclusive on both sides)."""
    from ocr_output_evaluation_spark.functions.text import quality_score
    from ocr_output_evaluation_spark.operators.quantile import quantile_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    score = quality_score(F.col("text"), "en")
    scored = docs.withColumn("score", score)
    n_by = {r.lang: r["count"] for r in scored.groupBy("lang").count().collect()}
    vals = {}
    for r in scored.select("lang", "score").collect():
        vals.setdefault(r.lang, []).append(r.score)
    for frac in (0.1, 0.3, 0.5, 1.0):
        got = {
            (r.lang, r.doc_id)
            for r in quantile_gate(docs, score, frac).select("lang", "doc_id").collect()
        }
        want = set()
        for r in scored.select("lang", "doc_id", "score").collect():
            xs = sorted(vals[r.lang], reverse=True)
            target = math.ceil(frac * n_by[r.lang])
            thr = xs[target - 1]
            if r.score >= thr:
                want.add((r.lang, r.doc_id))
        assert got == want, frac


def test_quantile_gate_tie_inclusive_and_validates(spark):
    from ocr_output_evaluation_spark.operators.quantile import quantile_gate

    # 10 rows, 4 of them tied at the 30%-cut score: all 4 keep.
    rows = [(i, "x", float(s)) for i, s in enumerate([9, 8, 7, 7, 7, 7, 3, 2, 1, 0])]
    df = spark.createDataFrame(rows, "id long, lang string, v double")
    kept = quantile_gate(df, F.round(F.col("v"), 6), 0.3).collect()
    assert {r.id for r in kept} == {0, 1, 2, 3, 4, 5}
    assert all(r.threshold == 7.0 for r in kept)
    with pytest.raises(ValueError):
        quantile_gate(df, F.col("v"), 0.0)


def test_quantile_gate_no_corpus_window_and_broadcasts(spark, sf_dir):
    """Scale pin: the corpus never enters a Window (only the bounded
    histogram frame does) and the threshold joins back as a broadcast."""
    from ocr_output_evaluation_spark.functions.text import quality_score
    from ocr_output_evaluation_spark.operators.quantile import quantile_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quantile_gate(docs, quality_score(F.col("text"), "en"), 0.3)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    # The windows run over the histogram aggregate (its count column),
    # never over a corpus-row frame — the per-lang global-sort trap.
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    win_inputs = re.findall(r"\(\d+\) Window[^(]*\n(?:.*\n)*?Input \[.*?\]: \[(.*?)\]", plan)
    for cols in win_inputs:
        assert "text" not in cols.split(", "), cols


# ---------------------------------------------------------------------------
# quantile_bucket_labels — CCNet head/middle/tail (X33)
# ---------------------------------------------------------------------------
def test_bucket_labels_match_naive_tertiles(spark, sf_dir):
    """Labels == the naive sorted-ascending definition (cut k = smallest
    value whose <=-population reaches ceil(frac*n), tie-inclusive), fuzzed
    across cut sets, on the real documents table scored by length."""
    import math

    from ocr_output_evaluation_spark.operators.quantile import quantile_bucket_labels

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", F.round(F.length("text") / 7.0, 2).alias("s"))
    )
    rows = docs.collect()
    vals: dict[str, list[float]] = {}
    for r in rows:
        vals.setdefault(r.lang, []).append(r.s)
    for cuts, labels in (
        ((1 / 3, 2 / 3), ("head", "middle", "tail")),
        ((0.1, 0.5, 0.9), ("a", "b", "c", "d")),
        ((0.5,), ("lo", "hi")),
    ):
        got = {
            (r.lang, r.doc_id): r.bucket
            for r in quantile_bucket_labels(docs, "s", cuts, labels).collect()
        }
        for r in rows:
            xs = sorted(vals[r.lang])
            n = len(xs)
            want = labels[-1]
            for k in range(len(cuts) - 1, -1, -1):
                cut = xs[math.ceil(cuts[k] * n) - 1]
                if r.s <= cut:
                    want = labels[k]
            assert got[(r.lang, r.doc_id)] == want, (cuts, r.lang, r.s)


def test_bucket_labels_ties_nulls_and_validation(spark):
    from ocr_output_evaluation_spark.operators.quantile import quantile_bucket_labels

    # 6 of 9 rows tied at the low value: the tie run reaches BOTH tertile
    # targets (le=6 >= 3 and >= 6), so t1 = t2 = 1.0 — all six ties are
    # 'head', 'middle' is empty, everything above is 'tail' (tie-inclusive
    # cuts collapse, they never split a tie run). NULL scores and NULL
    # groups drop out entirely.
    rows = [(i, "x", v) for i, v in enumerate([1.0] * 6 + [5.0, 6.0, 7.0])]
    rows += [(90, "x", None), (91, None, 2.0)]
    df = spark.createDataFrame(rows, "id long, lang string, s double")
    got = {r.id: r.bucket for r in quantile_bucket_labels(df, "s").collect()}
    assert got == {0: "head", 1: "head", 2: "head", 3: "head", 4: "head",
                   5: "head", 6: "tail", 7: "tail", 8: "tail"}
    with pytest.raises(ValueError):
        quantile_bucket_labels(df, "s", cuts=(0.5, 0.3))
    with pytest.raises(ValueError):
        quantile_bucket_labels(df, "s", cuts=(0.5,), labels=("only",))


def test_ppl_buckets_are_ordered_and_partition_the_scored_corpus(spark, sf_dir):
    """CCNet semantics on the composed query: per lang the three buckets
    partition the finite-scored docs, sizes are within one tie-run of n/3,
    and mean perplexity strictly increases head -> middle -> tail."""
    from ocr_output_evaluation_spark.queries import ppl_bucket_report

    rows = ppl_bucket_report(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        assert b["head"].avg_ppl < b["middle"].avg_ppl < b["tail"].avg_ppl, lang
        assert b["head"].max_ppl <= b["middle"].min_ppl, lang
        assert b["middle"].max_ppl <= b["tail"].min_ppl, lang
        tot = sum(x.n_docs for x in b.values())
        assert b["head"].n_docs >= tot // 3  # tie-inclusive: never undershoots
