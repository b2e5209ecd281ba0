"""Capstone composition: the monthly-crawl refresh flow the r4 operators
were built for, end to end on real extracted pages —

    crawl A --extract--> corpus A --build--> LSH index
    crawl B --extract--> corpus B
    snapshot_diff(A, B)          -> delta (added/removed/changed)
    lsh_index_update(index, ...) -> updated index (== rebuild, pinned)
    lsh_index_probe(delta)       -> near-dup matches for NEW pages

Only the delta is ever re-hashed; planted copies are caught against the
index; the incremental index is frame-identical to a full rebuild."""

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.extract.udf import with_extraction
from ocr_output_evaluation_spark.fixtures.generate import web_pages_df
from ocr_output_evaluation_spark.operators.diff import snapshot_diff
from ocr_output_evaluation_spark.operators.lshindex import (
    lsh_index_build,
    lsh_index_probe,
    lsh_index_update,
)


def _extracted(pages):
    return (
        with_extraction(pages)
        .select("url", F.col("extraction.extracted_text").alias("text"))
        .filter(F.col("text").isNotNull() & (F.length("text") >= 5))
    )


def test_incremental_crawl_refresh(spark):
    pages_a = web_pages_df(spark, 120, 8).cache()
    a = _extracted(pages_a).cache()

    # crawl B: 10 urls vanish, 10 pages get an appended paragraph
    # (changed), and 8 NEW urls duplicate existing pages' html (the
    # planted near-dups an incremental dedup pass must catch)
    url_id = F.regexp_extract("url", r"(\d+)", 1).cast("long")
    b_kept = pages_a.filter(url_id % 12 != 0)
    b_changed = b_kept.withColumn(
        "html",
        F.when(
            url_id % 9 == 0,
            F.concat(
                F.col("html"),
                F.lit(b"<p>updated paragraph for the new crawl</p>"),
            ),
        ).otherwise(F.col("html")),
    )
    dup_src = pages_a.filter(url_id % 15 == 1).limit(8)
    b_new = dup_src.select(
        F.concat(F.lit("https://mirror.example/"), F.col("url")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )
    pages_b = b_changed.unionByName(b_new)
    b = _extracted(pages_b).cache()

    d = snapshot_diff(a, b, "url", ["text"]).cache()
    counts = {r["status"]: r["n"] for r in
              d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("added", 0) >= 1
    assert counts.get("removed", 0) >= 1
    assert counts.get("unchanged", 0) > counts.get("changed", 0)

    index0, sigs0 = lsh_index_build(a, "text", "url")
    drop = d.filter(F.col("status").isin("removed", "changed")).select("url")
    ups = b.join(
        F.broadcast(
            d.filter(F.col("status").isin("added", "changed")).select("url")
        ),
        "url",
    )
    index1, sigs1 = lsh_index_update(index0, sigs0, drop, ups, "text", "url")

    # the maintenance invariant on REAL extracted text
    index_r, sigs_r = lsh_index_build(b, "text", "url")
    assert sorted(map(tuple, index1.collect())) == sorted(
        map(tuple, index_r.collect())
    )

    # every planted mirror whose original survives into B (and extracted
    # — identical html means mirror and original extract identically)
    # must match its original in the updated index
    matches = lsh_index_probe(index1, sigs1, ups, "text", "url")
    pairs = {(r.query_id, r.index_id) for r in matches.collect()}
    b_urls = {r.url for r in b.select("url").collect()}
    expected = {
        (f"https://mirror.example/{u}", u)
        for u in (r.url for r in dup_src.select("url").collect())
        if u in b_urls
    }
    assert expected, "fixture produced no surviving planted mirrors"
    missing = expected - pairs
    assert not missing, f"planted mirrors not matched: {missing}"
