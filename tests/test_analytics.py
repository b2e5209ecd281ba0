"""EP2/EP3 analytics layer (plans/analytics.py) + IO helpers (sources/io.py):
union-enrich, bucket chain, rollups, pivot matrix, SQL views — checked
against pandas goldens on small in-memory frames.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.plans.analytics import (
    CANNED_SUMMARY_SQL,
    combine_and_enrich,
    pivot_matrix,
    quality_bucket,
    rollup_by,
)
from ocr_output_evaluation_spark.sources.io import (
    read_csv_dim,
    register_views,
    write_csv,
    write_parquet,
)

_INF = float("inf")


@pytest.fixture(scope="module")
def stats_frames(spark):
    a = spark.createDataFrame(
        [("d1", 0.95, 120.0), ("d2", 0.60, 9000.0), ("d3", None, 300.0)],
        "domain string, avg_mean_conf double, mean_ppl double",
    )
    # second source lacks the confidence column entirely (heterogeneous union)
    b = spark.createDataFrame(
        [("d1", 480.0), ("d4", float("inf"))],
        "domain string, mean_ppl double",
    )
    dim = spark.createDataFrame(
        [("d1", "news"), ("d2", "blog"), ("d3", "docs")],
        "domain string, category string",
    )
    return a, b, dim


def test_combine_and_enrich_union_tags_and_left_join(spark, stats_frames):
    a, b, dim = stats_frames
    out = combine_and_enrich({"alpha": a, "beta": b}, [(dim, "domain")])
    rows = {(r.domain, r.source_system): r for r in out.collect()}
    assert len(rows) == 5
    # missing column NULL-filled in the beta rows
    assert rows[("d1", "beta")].avg_mean_conf is None
    # literal tags present; left-join misses keep the row with NULL dim
    assert rows[("d4", "beta")].category is None
    assert rows[("d1", "alpha")].category == "news"


def test_quality_bucket_chain(spark):
    df = spark.createDataFrame(
        [
            (0.95, 500.0),     # high conf, low ppl -> high_quality
            (0.75, 3000.0),    # medium
            (0.50, 9000.0),    # low
            (0.95, 9000.0),    # conflicting -> mixed_signals
            (None, 100.0),     # unscored
            (0.9, float("nan")),  # NaN ppl -> unscored (valid() triage)
        ],
        "c double, p double",
    )
    got = [r.b for r in df.select(quality_bucket("c", "p").alias("b")).collect()]
    assert got == [
        "high_quality",
        "medium_quality",
        "low_quality",
        "mixed_signals",
        "unscored",
        "unscored",
    ]


def test_rollup_by_golden(spark, stats_frames):
    a, b, dim = stats_frames
    combined = combine_and_enrich({"alpha": a, "beta": b}, [(dim, "domain")])
    out = rollup_by(combined, ["category"]).collect()
    by_cat = {r.category: r for r in out}
    assert by_cat["news"].n == 2
    # inf mean_ppl filtered by valid(): d4 contributes count but not stats
    assert by_cat[None].n == 1 and by_cat[None].avg_ppl is None
    assert by_cat["news"].avg_ppl == pytest.approx((120.0 + 480.0) / 2)
    assert by_cat["blog"].median_ppl == pytest.approx(9000.0)
    # ordering: by avg_ppl asc, nulls last
    cats = [r.category for r in out]
    assert cats[-1] is None


def test_pivot_matrix_shape_and_filter(spark):
    rows = []
    for sys_name, pm, vals in [
        ("s1", "a", [1.0] * 6),
        ("s1", "b", [3.0] * 6),
        ("s2", "a", [2.0] * 6),
        ("s2", "rare", [9.0] * 2),  # below min_count -> cell dropped
    ]:
        rows += [(sys_name, pm, v) for v in vals]
    df = spark.createDataFrame(rows, "sys string, pm string, v double")
    wide = pivot_matrix(df, "pm", "sys", "v", min_count=5, top_rows=15)
    data = {r.pm: r.asDict() for r in wide.collect()}
    assert data["a"]["s1"] == pytest.approx(1.0)
    assert data["a"]["s2"] == pytest.approx(2.0)
    assert data["b"]["s1"] == pytest.approx(3.0)
    assert data["b"].get("s2") is None
    assert "rare" not in data
    pms = [r.pm for r in wide.collect()]
    assert pms == sorted(data, key=lambda p: sum(filter(None, [data[p].get("s1"), data[p].get("s2")])) / 2)


def test_register_views_and_canned_sql(spark, stats_frames, tmp_path):
    a, b, dim = stats_frames
    combined = combine_and_enrich({"alpha": a, "beta": b}, [(dim, "domain")])
    gm = combined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("avg_mean_conf").alias("avg_mean_conf"),
        F.avg("mean_ppl").alias("mean_ppl"),
    )
    p = str(tmp_path / "group_metrics.parquet")
    write_parquet(gm, p)
    register_views(spark, {"group_metrics": p})
    row = spark.sql(CANNED_SUMMARY_SQL).collect()[0]
    assert row.n_groups == 4
    assert row.total_docs == 5
    assert not math.isinf(row.overall_mean_ppl)


def test_csv_dim_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([("d1", "news"), ("d2", "blog")], "x string, y string")
    p = str(tmp_path / "dim_csv")
    write_csv(src, p)
    back = read_csv_dim(spark, p, ["domain", "category"])
    assert back.columns == ["domain", "category"]
    assert {(r.domain, r.category) for r in back.collect()} == {("d1", "news"), ("d2", "blog")}


def test_jsonl_roundtrip_and_binary_guard(spark, tmp_path):
    from pyspark.sql import types as T

    from ocr_output_evaluation_spark.sources.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [("http://a/1", "hello", 5), ("http://a/2", None, 0)],
        "url string, text string, n_chars int",
    )
    p = str(tmp_path / "docs.jsonl")
    write_jsonl(df, p)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
    back = read_jsonl(spark, p, schema)
    assert {(r.url, r.text, r.n_chars) for r in back.collect()} == {
        ("http://a/1", "hello", 5),
        ("http://a/2", None, 0),
    }

    binary_df = spark.createDataFrame([("u", bytearray(b"\x00"))], "url string, html binary")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="BinaryType"):
        write_jsonl(binary_df, str(tmp_path / "bad.jsonl"))
