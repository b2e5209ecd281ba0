"""Physical-plan audits — the scale properties the engine promises must be
visible in `.explain("formatted")`, not just hoped for:

- filters reach the parquet scan (PushedFilters),
- scans read only the projected columns (ReadSchema),
- dimension joins broadcast (BroadcastHashJoin, no shuffle of the fact side),
- aggregations split partial/final (map-side combine before the exchange),
- the extraction stage never carries the raw `text` column and shuffles
  exactly once (the explicit bucket repartition).

These are regression tests for plan SHAPE: a change that silently turns a
broadcast join into a sort-merge join, or widens a scan, fails here long
before it shows up as a 100 TB incident.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their numbered detail header — formatted mode
    prints each node in both the tree and the detail section."""
    import re

    return len(re.findall(rf"^\(\d+\) {name}", plan, re.M))


def n_shuffles(plan: str) -> int:
    """Count shuffle exchanges (formatted mode puts the partitioning in the
    detail section, so count hashpartitioning argument lines; broadcast
    exchanges use HashedRelationBroadcastMode and don't match)."""
    return plan.count("hashpartitioning(")


def scan_sections(plan: str) -> list[str]:
    out, cur = [], None
    for line in plan.splitlines():
        if "Scan parquet" in line and line.startswith("("):
            cur = []
        elif cur is not None:
            if line.startswith("(") and cur:
                out.append("\n".join(cur))
                cur = None
            else:
                cur.append(line)
    if cur:
        out.append("\n".join(cur))
    return out


def test_q1_pushdown_pruning_partial_agg(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to scan"
    (scan,) = scan_sections(plan)
    assert "l_orderkey" not in scan, "scan reads columns the query never uses"
    assert "l_partkey" not in scan
    assert "partial_sum" in plan, "no map-side partial aggregation"
    assert n_shuffles(plan) == 1, "more than one shuffle"


def test_q5_all_dims_broadcast_single_shuffle(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import q5_local_supplier_volume

    plan = plan_of(q5_local_supplier_volume(spark, sf_dir))
    assert n_nodes(plan, "BroadcastHashJoin") == 5, "expected all 5 joins broadcast"
    assert "SortMergeJoin" not in plan
    assert n_shuffles(plan) == 1, (
        "fact table should shuffle exactly once (for the final groupBy)"
    )
    assert "EqualTo(r_name,ASIA)" in plan, "region filter not pushed down"


def test_q3_customer_broadcast(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import q3_shipping_priority

    plan = plan_of(q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan, "top-10 should not be a global sort"


def test_top_docs_is_take_ordered(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import top_docs_by_len

    plan = plan_of(top_docs_by_len(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert n_shuffles(plan) == 0


def test_extraction_plan_prunes_and_shuffles_once(spark, tmp_path):
    from ocr_output_evaluation_spark.extract import extraction_version
    from ocr_output_evaluation_spark.fixtures.generate import web_pages_df
    from ocr_output_evaluation_spark.plans.pipeline import bucketed, extraction_plan

    src_path = str(tmp_path / "wp")
    web_pages_df(spark, 50, 2).write.parquet(src_path)
    src = bucketed(spark.read.parquet(src_path), 8)
    df = extraction_plan(src, list(range(8)), extraction_version(), 8)
    plan = plan_of(df)
    (scan,) = scan_sections(plan)
    # the raw `text` column must never leave the scan — html is the input,
    # extracted_text the output; reading `text` would double the scan bytes
    assert "text:" not in scan.split("ReadSchema")[-1], "raw text column not pruned"
    assert "html" in scan
    assert n_shuffles(plan) == 1, (
        "extraction should shuffle exactly once (bucket repartition)"
    )
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "BatchEvalPython" in plan


def test_group_stats_single_shuffle_partial_agg(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import group_moment_stats

    plan = plan_of(group_moment_stats(spark, sf_dir))
    # exact percentiles force an ObjectHashAggregate, still partial+final
    assert n_shuffles(plan) == 1
    assert "partial_" in plan


def test_salted_stats_two_shuffles_no_more(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import salted_source_stats

    plan = plan_of(salted_source_stats(spark, sf_dir))
    # phase 1 groups by (key, salt), phase 2 by key -> exactly two exchanges
    assert n_shuffles(plan) == 2


def test_perplexity_lm_join_is_broadcast(spark, sf_dir):
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.fixtures.generate import reference_lm_pdf
    from ocr_output_evaluation_spark.operators.perplexity import perplexity_native
    from ocr_output_evaluation_spark.schema import REFERENCE_LM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", F.col("text").alias("extracted_text")
    )
    lm = spark.createDataFrame(reference_lm_pdf(), schema=REFERENCE_LM)
    plan = plan_of(perplexity_native(docs, lm, id_col="doc_id"))
    assert "BroadcastHashJoin" in plan, "LM join must broadcast, never shuffle docs"


def test_enrich_union_left_join_is_broadcast(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import enrich_union_stats

    plan = plan_of(enrich_union_stats(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Union" in plan


def test_rollup_uses_expand_single_pass(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import rollup_nation_totals

    plan = plan_of(rollup_nation_totals(spark, sf_dir))
    # grouping sets compile to one Expand + one aggregation pass, not one
    # scan per grouping level
    assert n_nodes(plan, "Expand") == 1
    assert n_nodes(plan, "Scan parquet") == 3  # customer + 2 broadcast dims


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "group_moment_stats", "token_stats", "quality_scores"],
)
def test_no_python_udfs_in_native_queries(spark, sf_dir, name):
    from ocr_output_evaluation_spark.queries import QUERIES

    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "BatchEvalPython" not in plan, f"{name} fell off the codegen path"
    assert "ArrowEvalPython" not in plan, f"{name} uses a Python UDF unexpectedly"


def test_anti_join_broadcasts_filtered_orders(spark, sf_dir):
    """customers_without_orders: the filtered orders side must broadcast
    (BroadcastHashJoin LeftAnti), the customer fact side must not shuffle
    before the join; one shuffle total (the final group-by)."""
    from ocr_output_evaluation_spark.queries import customers_without_orders

    plan = plan_of(customers_without_orders(spark, sf_dir))
    assert "LeftAnti" in plan
    assert n_nodes(plan, "BroadcastHashJoin") == 1
    assert n_shuffles(plan) == 1  # only the c_mktsegment aggregation


def test_pairwise_topk_single_shuffle_then_local_topk(spark, sf_dir):
    """embedding_pair_topk: exactly one shuffle (the block-pair groupBy into
    applyInPandas) and a TakeOrderedAndProject final — no global sort, no
    dedup exchange before the matmul stage."""
    from ocr_output_evaluation_spark.queries import embedding_pair_topk

    plan = plan_of(embedding_pair_topk(spark, sf_dir))
    assert n_nodes(plan, "FlatMapGroupsInPandas") == 1
    assert n_nodes(plan, "TakeOrderedAndProject") == 1
    assert n_nodes(plan, "Sort") <= 1  # only the groupBy-keys sort for applyInPandas
    assert n_shuffles(plan) == 1


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO shuffle exchanges (the 100 TB fact-fact join layout) —
    and the same join over plain parquet must shuffle, proving the bucketing
    (not the data size) removed the exchanges."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.sources.io import write_bucketed_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(
            o, "orders_b", ["o_orderkey"], 8, str(tmp_path / "ob"), ["o_orderkey"]
        )
        write_bucketed_table(
            l, "lineitem_b", ["l_orderkey"], 8, str(tmp_path / "lb"), ["l_orderkey"]
        )
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        plan = plan_of(joined)
        assert n_nodes(plan, "SortMergeJoin") == 1
        # the ONLY exchange allowed is the final 1-key aggregation
        assert n_shuffles(plan) == 1, plan

        plain = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        assert n_shuffles(plan_of(plain)) == 3  # both join sides + the agg

        # same result either way
        a = {(r.o_orderpriority, round(r.qty, 2)) for r in joined.collect()}
        b = {(r.o_orderpriority, round(r.qty, 2)) for r in plain.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_and_salts_the_key(spark):
    """salted_join: result-identical to the plain join (incl. left rows with
    no match) and the physical join condition carries the salt column."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.operators.salted import salted_join

    big = spark.createDataFrame(
        [(k, i) for i in range(300) for k in (["hot"] if i % 2 == 0 else [f"k{i}"])],
        "key string, row_id int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k3", "B")], "key string, tag string"
    )
    got = salted_join(big, small, "key", salt_col="row_id", n_salts=4)
    want = big.join(small, "key")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    left_got = salted_join(big, small, "key", salt_col="row_id", n_salts=4, how="left")
    left_want = big.join(small, "key", "left")
    assert sorted((r.key, r.row_id, r.tag) for r in left_got.collect()) == sorted(
        (r.key, r.row_id, r.tag) for r in left_want.collect()
    )

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the join really keys on (key, salt)
