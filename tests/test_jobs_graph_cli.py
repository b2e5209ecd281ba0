"""CLI surface for the graph and snapshot-diff jobs: in-process
jobs.main() e2e — outputs land as parquet and agree with the operators."""

import json

from pyspark.sql import functions as F

from ocr_output_evaluation_spark import jobs
from ocr_output_evaluation_spark.operators.pagerank import pagerank
from ocr_output_evaluation_spark.operators.triangles import node_triangle_counts


def test_graph_cli_both(spark, tmp_path, capsys):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    src = str(tmp_path / "edges")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(src)
    out = str(tmp_path / "out")
    assert jobs.main(["graph", "--edges", src, "--out", out, "--iters", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["built"] == ["pagerank", "triangles"]

    got_pr = {
        r.node: r.rank_nano
        for r in spark.read.parquet(f"{out}/pagerank").collect()
    }
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    want_pr = {
        r.node: r.rank_nano for r in pagerank(nodes, e, n_iters=3).collect()
    }
    assert got_pr == want_pr

    got_tri = {
        r.node: r.n_tri
        for r in spark.read.parquet(f"{out}/triangles").collect()
    }
    assert got_tri == {0: 1, 1: 1, 2: 1}  # the 0-1-2 cycle; 3 is pendant


def test_snapshot_diff_cli(spark, tmp_path, capsys):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, text string"
    ).write.parquet(a)
    spark.createDataFrame(
        [(2, "y"), (3, "z2"), (4, "w")], "k long, text string"
    ).write.parquet(b)
    out = str(tmp_path / "out")
    assert (
        jobs.main(
            [
                "snapshot-diff",
                "--old", a,
                "--new", b,
                "--key", "k",
                "--compare-cols", "text",
                "--out", out,
            ]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["counts"] == {
        "removed": 1, "unchanged": 1, "changed": 1, "added": 1
    }
    statuses = {
        r.k: r.status for r in spark.read.parquet(f"{out}/diff").collect()
    }
    assert statuses == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_optimize_cli_zorder(spark, tmp_path, capsys):
    import json as _json

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(i % 50, (i * 37) % 50) for i in range(1000)], "x long, y long"
    ).write.parquet(src)
    out = str(tmp_path / "z")
    assert (
        jobs.main(
            ["optimize", "--table", src, "--cols", "x,y", "--out", out,
             "--n-files", "8", "--bits", "6"]
        )
        == 0
    )
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["cols"] == ["x", "y"]
    rd = spark.read.parquet(out)
    assert rd.count() == 1000
    assert "z_bucket" in rd.columns
    assert rd.selectExpr("sum(x)").collect() == spark.read.parquet(
        src
    ).selectExpr("sum(x)").collect()
