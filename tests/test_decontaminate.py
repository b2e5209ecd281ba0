"""Benchmark decontamination + repetition quality metrics (r3 training-data
ops). The report queries are DuckDB-oracle-checked end-to-end by the driver;
these tests pin the operator-level semantics on planted fixtures."""

from pyspark.sql import functions as F


def test_contamination_scores_planted(spark):
    from ocr_output_evaluation_spark.operators.decontaminate import (
        contamination_scores,
    )

    corpus = spark.createDataFrame(
        [
            # exact copy of the benchmark doc -> overlap 1.0
            (1, "alpha beta gamma delta epsilon zeta"),
            # shares the first five tokens (two of its three 4-grams) with
            # the benchmark -> overlap 2/3
            (2, "alpha beta gamma delta epsilon omega"),
            # disjoint vocabulary -> overlap 0.0
            (3, "one two three four five six"),
            # < 4 tokens -> nothing to test: n_grams 0, overlap NULL
            (4, "too short here"),
            # duplicate n-grams inside the doc count once (distinct grams)
            (5, "alpha beta gamma delta alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.overlap)
        for r in contamination_scores(
            corpus, bench, "text", "doc_id", n=4
        ).collect()
    }
    assert got[1] == (3, 3, 1.0)
    assert got[2][0] == 3 and got[2][1] == 2 and abs(got[2][2] - 2 / 3) < 1e-12
    assert got[3] == (3, 0, 0.0)
    assert got[4] == (0, 0, None)
    # doc 5: tokens a b g d a b g d -> 5 4-grams, distinct = 4 ("a b g d"
    # appears at positions 0 and 4); hits: "alpha beta gamma delta" is the
    # only one in the benchmark set
    assert got[5] == (4, 1, 0.25)


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    """Plan pin for the 100 TB shape: the benchmark n-gram key set joins the
    corpus as a BroadcastHashJoin — the corpus must never shuffle for
    membership (its only exchange is the per-doc aggregation merge)."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import contamination_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        contamination_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "aggregate(" not in plan  # no interpreted HOF fold anywhere


def test_word_ngrams_and_tokens_edges(spark):
    from ocr_output_evaluation_spark.functions.ngram import (
        word_ngrams,
        word_tokens,
    )

    df = spark.createDataFrame(
        [("A  b\tc",), ("",), (None,), ("x y",), ("1 2 3 4",)], "t string"
    )
    rows = df.select(
        word_tokens("t").alias("w"), word_ngrams("t", 2).alias("g")
    ).collect()
    # normalization lowercases, collapses whitespace, strips non-letters
    assert rows[0].w == ["a", "b", "c"] and rows[0].g == ["a b", "b c"]
    assert rows[1].w == [] and rows[1].g == []
    assert rows[2].w == [] and rows[2].g == []
    assert rows[3].g == ["x y"]
    # digits are stripped by normalize_for_scoring -> no tokens at all
    assert rows[4].w == [] and rows[4].g == []


def test_repetition_metrics_hand_computed(spark, tmp_path):
    """repetition_report on a two-doc fixture with hand-computed fractions."""
    from ocr_output_evaluation_spark.queries import repetition_report

    docs = spark.createDataFrame(
        [
            # "a a a a" : 4 tokens, 1 distinct -> dup_word 3/4
            #   2-grams: "a a" x3 -> top2 = 1.0; 3-grams "a a a" x2 -> dup3 = 1.0
            (0, "a a a a", "xx", "s", 7),
            # "a b c d" : all distinct -> dup_word 0; all 2/3-grams unique
            (1, "a b c d", "xx", "s", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    [r] = repetition_report(spark, d).collect()
    assert r.lang == "xx" and r.n_docs == 2
    assert abs(r.avg_dup_word_frac - (0.75 + 0.0) / 2) < 1e-9
    assert abs(r.avg_top_2gram_frac - (1.0 + 1 / 3) / 2) < 1e-6
    assert abs(r.avg_dup_3gram_frac - (1.0 + 0.0) / 2) < 1e-9
    assert r.n_repetitive == 2  # both exceed the 0.05 top-2gram share


def test_pii_scrub_chain_and_counts(spark):
    """functions/pii.py: pattern coverage and the overlap-safe chain order —
    a dotted IPv4 must never be swallowed by the phone pattern, and email
    local parts must not be clipped as phones."""
    from ocr_output_evaluation_spark.functions.pii import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            ("contact bob.smith+x@example.co.uk now",),
            ("call +1-555-123-4567 or 555 987 6543",),
            ("host 192.168.001.200 and 8.8.8.8",),
            ("mixed a1@b.io then 10.0.0.1 then +44 20 7946 0958",),
            ("clean text with no pii at all",),
        ],
        "t string",
    )
    ne, ni, np_ = pii_counts("t")
    rows = df.select(
        scrub_pii("t").alias("s"), ne.alias("ne"), ni.alias("ni"), np_.alias("np")
    ).collect()
    assert rows[0].s == "contact <EMAIL> now" and rows[0].ne == 1
    assert rows[1].s == "call <PHONE> or <PHONE>" and rows[1].np == 2
    # the IPs must come out as <IP>, not <PHONE> (chain order)
    assert rows[2].s == "host <IP> and <IP>" and (rows[2].ni, rows[2].np) == (2, 0)
    assert rows[3].s == "mixed <EMAIL> then <IP> then <PHONE>"
    assert (rows[3].ne, rows[3].ni, rows[3].np) == (1, 1, 1)
    assert rows[4].s == "clean text with no pii at all"
    assert (rows[4].ne, rows[4].ni, rows[4].np) == (0, 0, 0)
