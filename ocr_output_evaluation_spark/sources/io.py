"""Readers / writers (SURVEY.md §2.1 S1-S9).

The reference's sources are a Postgres catalog (db_queries.py:9-48), per-volume
S3 parquet reads (parallel_processor.py:73), CSV dims (metadata_loader.py:29-41)
and parquet/CSV sinks (analyze_confidence.py:95-100). Spark-first equivalents:
one parquet/Iceberg scan per *table* (partition-parallel, pushdown, pruning),
not one Python read per file.

Iceberg note: the Iceberg runtime jar is not in this container, so
``read_table`` speaks parquet directories with an identical call shape; on a
cluster the same function body switches to ``spark.read.table`` /
``writeTo(...).append()`` — gated by a format probe, not a code rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_table(
    spark: SparkSession, path_or_name: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet path (sandbox) or catalog table name (cluster, iceberg)."""
    if os.path.sep in path_or_name or path_or_name.endswith(".parquet"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(path_or_name)
    return spark.read.table(path_or_name)


def read_csv_dim(
    spark: SparkSession, path: str, column_names: list[str] | None = None
) -> DataFrame:
    """S3: CSV dimension scan with positional rename
    (/root/reference/metadata_loader.py:29-31)."""
    df = spark.read.csv(path, header=True)
    if column_names:
        df = df.toDF(*column_names)
    return df


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S5: parquet sink; dynamic partition overwrite so bucket-scoped re-runs
    replace exactly their partitions (resume idempotence)."""
    w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source (the common interchange format for crawl/document
    dumps). Always pass a schema at scale — schema inference is a full extra
    pass over the data; with a schema the read is single-pass and corrupt
    lines land in NULL columns instead of failing the job (PERMISSIVE mode,
    Spark default)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one JSON object per line, partition-parallel).
    Binary columns don't round-trip through JSON — base64 or drop them
    first; the write fails fast on BinaryType rather than silently
    corrupting."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            raise ValueError(
                f"write_jsonl: column {f.name!r} is BinaryType — base64-encode "
                "or drop binary columns before a JSON sink"
            )
    df.write.mode("overwrite").json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed-table sink: the co-located-join layout for the big
    fact-fact joins (SURVEY.md §4.1 partition pruning row; Iceberg analog:
    ``bucket(n, col)`` partition transform). Two tables bucketed on the join
    key with the same bucket count join WITHOUT any shuffle exchange — at
    100 TB that turns the orders⋈lineitem class of joins from the dominant
    shuffle into a map-side zip of matching buckets (pinned by
    tests/test_plans.py::test_bucketed_join_no_shuffle). ``sort_cols``
    additionally pre-sorts within buckets so sort-merge joins skip their
    sort. Parquet-backed with an explicit ``path``; bucketing metadata lives
    in the session catalog (saveAsTable — plain .parquet() paths cannot
    carry it)."""
    w = df.write.mode("overwrite").format("parquet").option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """S6: human-facing CSV sink; small outputs coalesce to one file."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def register_views(spark: SparkSession, tables: dict[str, str]) -> None:
    """S7: the explore_stats.py analog — register parquet paths as SQL views
    so ``spark.sql`` serves the same canned/interactive queries DuckDB did
    (/root/reference/explore_stats.py:20-43)."""
    for name, path in tables.items():
        spark.read.parquet(path).createOrReplaceTempView(name)
