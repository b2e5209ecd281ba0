"""X57 Z-order layout: Morton-key python crosscheck and the measurable
pruning claim — a z-clustered layout gives BOTH interleaved columns
usable per-file min/max statistics, a single-column sort only one."""

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.sources.zorder import (
    cluster_by_zorder,
    morton_key,
)


def _py_morton(x, y, bits):
    x = min(max(x, 0), (1 << bits) - 1)
    y = min(max(y, 0), (1 << bits) - 1)
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python(spark):
    rows = [(x, y) for x in (-3, 0, 1, 77, 100, 5000) for y in (0, 63, 99, 128)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y"), bits=7).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y, 7), (r.x, r.y)


def _files_touched(spark, path, pred_cols):
    """Files whose per-file [min, max] intersects the predicate box —
    what a stats-based reader would have to open."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    stats = df.groupBy("_f").agg(
        *[F.min(c).alias(f"lo_{c}") for c, _, _ in pred_cols],
        *[F.max(c).alias(f"hi_{c}") for c, _, _ in pred_cols],
    )
    cond = F.lit(True)
    for c, lo, hi in pred_cols:
        cond = cond & (F.col(f"hi_{c}") >= lo) & (F.col(f"lo_{c}") <= hi)
    return stats.count(), stats.filter(cond).count()


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    # independent dimensions, 10k rows
    rows = [(i % 100, (i * 37) % 100) for i in range(10_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    cluster_by_zorder(df, "x", "y", zpath, n_files=16, bits=7)
    # linear baseline: the same file count, clustered by x alone
    (
        df.withColumn("_b", F.expr("div(x * 16, 100)"))
        .repartition(16, F.col("_b"))
        .sortWithinPartitions("_b", "x")
        .write.partitionBy("_b")
        .mode("overwrite")
        .parquet(lpath)
    )

    # (a) predicate on the SECOND dimension only: the linear layout has no
    # usable stats (every file spans all y), the z layout must prune
    box_y = [("y", 10, 29)]
    z_total, z_hit = _files_touched(spark, zpath, box_y)
    l_total, l_hit = _files_touched(spark, lpath, box_y)
    assert l_hit == l_total  # x-sorted layout cannot prune on y
    assert z_hit < z_total  # z layout prunes on y
    assert z_hit < l_hit

    # (b) a 2D box: z touches at most as many files, and strictly fewer
    # than the linear layout's y-blindness forces
    box = [("x", 10, 29), ("y", 10, 29)]
    _, z_hit2 = _files_touched(spark, zpath, box)
    _, l_hit2 = _files_touched(spark, lpath, box)
    assert z_hit2 <= l_hit2
    # values survive the round-trip exactly (layout is order-only)
    assert (
        spark.read.parquet(zpath).selectExpr(
            "sum(x) as sx", "sum(y) as sy", "count(*) as n"
        ).collect()
        == df.selectExpr("sum(x) as sx", "sum(y) as sy", "count(*) as n").collect()
    )


def test_zbucket_directory_pruning(spark, tmp_path):
    """z_bucket comes back as a partition column: a predicate on it must
    plan with PartitionFilters (directory-level pruning for free)."""
    import io
    from contextlib import redirect_stdout

    rows = [(i % 64, (i * 7) % 64) for i in range(2_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z")
    cluster_by_zorder(df, "x", "y", path, n_files=8, bits=6)
    rd = spark.read.parquet(path).filter(F.col("z_bucket") == 3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rd.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan
    assert "z_bucket" in plan.split("PartitionFilters:")[1].split("]")[0]
