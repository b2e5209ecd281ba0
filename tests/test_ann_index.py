"""Materialized ANN index (operators/ann_index.py) + codegen hyperplane
signatures (similarity.hyperplane_signatures_multi): bit parity with the
expression form, probe-result equivalence with the one-shot forms, and the
plan-level pruning guarantees (bucket pruning for LSH, partition pruning
for IVF) that make the index the 100 TB path."""

import os

import pytest
from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vec(spark, sf_dir):
    e = _emb(spark, sf_dir)
    return [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0].embedding]


def test_hyperplane_signatures_parity_with_expression_form(spark, sf_dir):
    """The explode->agg codegen path must be bit-identical to the per-row
    interpreted expression form, per band seed, for every non-empty vector."""
    from ocr_output_evaluation_spark.operators.similarity import (
        hyperplane_signature,
        hyperplane_signatures_multi,
    )

    e = _emb(spark, sf_dir).limit(200)
    seeds = (42, 42 + 7919, 42 + 2 * 7919)
    expr = e.select(
        F.col("vec_id").alias("_id"),
        F.array(
            *[
                hyperplane_signature(F.col("embedding"), n_planes=12, seed=s)
                for s in seeds
            ]
        ).alias("_sigs"),
    ).filter(F.size("embedding") > 0)
    fast = hyperplane_signatures_multi(e, "embedding", "vec_id", n_planes=12, seeds=seeds)
    a = {r._id: list(r._sigs) for r in expr.collect()}
    b = {r._id: list(r._sigs) for r in fast.collect()}
    assert a == b
    assert len(a) > 0


def test_lsh_indexed_probe_matches_oneshot_and_prunes_buckets(spark, sf_dir, tmp_path):
    from ocr_output_evaluation_spark.operators.ann_index import (
        build_lsh_index,
        lsh_top_k_indexed,
    )
    from ocr_output_evaluation_spark.operators.similarity import lsh_top_k

    e = _emb(spark, sf_dir)
    q = _query_vec(spark, sf_dir)
    name = "ooe_test_lsh_idx"
    build_lsh_index(
        spark, e, "embedding", "vec_id", name, str(tmp_path / "lsh"), n_planes=12,
        seed=42, n_buckets=16,
    )
    probed = lsh_top_k_indexed(spark, name, q, k=10, n_planes=12, seed=42, multiprobe=1)
    oneshot = lsh_top_k(spark, e, "embedding", "vec_id", q, k=10, multiprobe=1)
    got = [(r[0], round(r.cosine, 9)) for r in probed.collect()]
    want = [(r[0], round(r.cosine, 9)) for r in oneshot.collect()]
    # k=10 but the 13-bucket probe set holds only a few of the 500 sf0.001
    # vectors — equality with the one-shot form is the contract
    assert got == want and len(got) >= 1

    # the probe scan must be restricted by bucket pruning: the 13-bucket
    # probe set cannot hash onto all 16 physical buckets reading the plan
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2))


def test_ivf_indexed_probe_matches_oneshot_and_prunes_partitions(spark, sf_dir, tmp_path):
    from ocr_output_evaluation_spark.operators.ann_index import (
        build_ivf_index,
        ivf_top_k_indexed,
    )
    from ocr_output_evaluation_spark.operators.similarity import ivf_top_k

    e = _emb(spark, sf_dir)
    q = _query_vec(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, e, "embedding", "vec_id", path, n_cells=8, seed=42)
    probed = ivf_top_k_indexed(spark, path, q, k=10, n_probe=3)
    oneshot = ivf_top_k(
        spark, e, "embedding", "vec_id", q, k=10, n_cells=8, n_probe=3, seed=42
    )
    got = [(r[0], round(r.cosine, 9)) for r in probed.collect()]
    want = [(r[0], round(r.cosine, 9)) for r in oneshot.collect()]
    assert got == want and len(got) == 10

    # partition pruning: the scan must carry a PartitionFilters entry on
    # cell, and list fewer input partitions than cells exist
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan


def test_ivf_index_layout_partitioned_by_cell(spark, sf_dir, tmp_path):
    """The physical layout IS the index: one directory per cell, so a probe
    reads nothing outside its cells."""
    from ocr_output_evaluation_spark.operators.ann_index import build_ivf_index

    e = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf2")
    build_ivf_index(spark, e, "embedding", "vec_id", path, n_cells=4, seed=42)
    cells = sorted(
        d for d in os.listdir(os.path.join(path, "index")) if d.startswith("cell=")
    )
    assert 1 <= len(cells) <= 4
    cents = spark.read.parquet(f"{path}/centroids")
    assert cents.count() == 4


def test_route_to_cells_np_matches_expression_form(spark, sf_dir):
    """The Arrow-numpy routing must assign the same cell as the expression
    form for every vector, including NULL/empty/zero/wrong-dim edge rows."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.operators.similarity import (
        route_to_cells,
        route_to_cells_expr,
        sample_centroids,
    )

    e = _emb(spark, sf_dir).limit(150)
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, []),
            (9003, [0.0] * 64),
            (9004, [1.0, 2.0]),  # wrong dim
        ],
        "vec_id long, embedding array<float>",
    )
    df = e.select("vec_id", "embedding").unionByName(edge)
    cents = sample_centroids(df, "embedding", "vec_id", 6, seed=11)
    got = {r.vec_id: r._cell for r in route_to_cells(df, "embedding", cents).collect()}
    want = {
        r.vec_id: r._cell for r in route_to_cells_expr(df, "embedding", cents).collect()
    }
    assert got == want and len(got) == 154
    assert got[9001] is None and got[9002] is None and got[9003] is None and got[9004] is None
