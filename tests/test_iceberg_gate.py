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


def test_parquet_fallback_roundtrip(spark, tmp_path):
    assert iceberg_available(spark) is False  # no runtime jar in this container
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 0)], "id int, v string, bucket int"
    )
    target = str(tmp_path / "t")
    assert write_table_any(spark, df, target, bucket_col="bucket") == "parquet"
    back = read_table_any(spark, target)
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    assert "bucket" in back.columns  # partition layout survived
    assert snapshot_id(spark, target) == target  # path-as-lineage fallback
