"""Iceberg gating (sources/iceberg.py): the confs an Iceberg deployment
needs are produced as data, the availability probe answers honestly in this
jar-less container, and the format-agnostic read/write helpers take the
parquet branch with identical results."""

from ocr_output_evaluation_spark.sources.iceberg import (
    conf_args,
    iceberg_available,
    iceberg_confs,
    read_table_any,
    snapshot_id,
    write_table_any,
)


def test_iceberg_confs_shape():
    confs = iceberg_confs("ooe", "s3://bucket/wh")
    assert confs["spark.sql.catalog.ooe"].endswith("SparkCatalog")
    assert confs["spark.sql.catalog.ooe.type"] == "hadoop"
    assert confs["spark.sql.catalog.ooe.warehouse"] == "s3://bucket/wh"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]
    args = conf_args(confs)
    assert args.count("--conf ") == 4 and "spark.sql.catalog.ooe=" in args


def test_parquet_fallback_roundtrip_hash_buckets(spark, tmp_path):
    assert iceberg_available(spark) is False  # no runtime jar in this container
    df = spark.createDataFrame(
        [(i, f"http://e.x/{i}") for i in range(40)], "id int, url string"
    )
    target = str(tmp_path / "t")
    # bucket_col is a RAW high-cardinality column: the parquet branch must
    # hash it into n_buckets partitions, NOT one directory per value
    assert write_table_any(spark, df, target, bucket_col="url", n_buckets=4) == "parquet"
    import os

    dirs = [d for d in os.listdir(target) if d.startswith("_bucket_url=")]
    assert 1 <= len(dirs) <= 4
    back = read_table_any(spark, target)
    # schema parity with the Iceberg branch (hidden partitioning): the
    # internal layout column is stripped on read
    assert back.count() == 40 and set(back.columns) == {"id", "url"}
    assert snapshot_id(spark, target) == target  # path-as-lineage fallback
