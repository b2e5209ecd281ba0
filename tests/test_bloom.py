"""X45 Bloom-filter membership prefilter (operators/bloom.py)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_bloom_no_false_negatives(spark):
    """The defining Bloom guarantee: every key the bitmap was built over
    passes the probe — exactly (not probabilistically)."""
    from ocr_output_evaluation_spark.operators.bloom import (
        bloom_m_bits,
        bloom_might_contain,
        build_bloom_bitmap,
    )

    keys = spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    m = bloom_m_bits(500)
    bitmap = build_bloom_bitmap(keys, "k", m)
    assert m == 64 * ((500 * 10 + 63) // 64) and len(bitmap) == m // 64
    n_pass = keys.where(
        bloom_might_contain(F.col("k"), bitmap, m)
    ).count()
    assert n_pass == 500


def test_bloom_culls_non_members(spark):
    """Non-members pass only at the false-positive rate: with 10 bits/key
    and k=7 the theoretical fpp is ~0.8%; allow 3% on 2000 probes. All
    hashes are deterministic (md5 of the key) so this is a fixed number,
    not a flaky draw."""
    from ocr_output_evaluation_spark.operators.bloom import (
        bloom_m_bits,
        bloom_might_contain,
        build_bloom_bitmap,
    )

    keys = spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    m = bloom_m_bits(500)
    bitmap = build_bloom_bitmap(keys, "k", m)
    others = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    n_fp = others.where(bloom_might_contain(F.col("k"), bitmap, m)).count()
    assert n_fp <= 60, n_fp  # 3% of 2000


def test_bloom_contamination_equals_exact(spark, sf_dir):
    """End-result identity with X21 on real fixture data: the bloom
    prefilter changes the physical plan, never the answer. Candidates
    always bound hits from above (no false negatives)."""
    from ocr_output_evaluation_spark.operators.bloom import (
        bloom_contamination_scores,
    )
    from ocr_output_evaluation_spark.operators.decontaminate import (
        contamination_scores,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    exact = {
        r.doc_id: (r.n_grams, r.n_hits, r.overlap)
        for r in contamination_scores(d, bench, "text", "doc_id", n=4).collect()
    }
    got = bloom_contamination_scores(d, bench, "text", "doc_id", n=4).collect()
    assert len(got) == len(exact)
    for r in got:
        assert (r.n_grams, r.n_hits, r.overlap) == exact[r.doc_id]
        assert r.n_hits <= r.n_cand <= r.n_grams


def test_bloom_prefilter_plan_shape(spark, sf_dir):
    """Plan pin for the 100 TB shape: the bitmap probe is a scan-side
    Filter (pmod/conv expressions — no join, no exchange introduced by
    the bloom layer), the exact verify stays a BroadcastHashJoin, and
    nothing corpus-scale sort-merge-shuffles."""
    from ocr_output_evaluation_spark.queries import bloom_contamination_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        bloom_contamination_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "pmod" in plan  # the in-row bitmap probe survived into the plan
