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


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1: JDBC control-plane scan (the reference's Postgres catalog,
    /root/reference/db_queries.py:9-48, reads task_executions/volumes/jobs
    via psycopg2). Spark-first shape: one lazy JDBC relation per table;
    Catalyst pushes filters and column pruning into the generated SQL
    (`PushedFilters` on the scan — pinned by tests/test_jdbc_catalog.py),
    so `WHERE status='done'` runs in the database, not in Spark.

    Catalog tables are control-plane small — a single-partition read is the
    norm. For a big JDBC fact table pass ``partition_column`` + bounds so
    the read fans out to ``num_partitions`` parallel range queries instead
    of one connection streaming everything through one task."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return r.load()


def catalog_volumes_for_job(
    spark: SparkSession, url: str, job_name: str, driver: str | None = None
) -> DataFrame:
    """The reference's `get_volumes_for_job` (db_queries.py:9-48) as a
    DataFrame plan over JDBC scans: task_executions ⋈ jobs (name filter)
    ⋈ volumes, status='done' pushed into the database, etag hex-encoded
    with the 6-char version prefix, ordered by volume id. Both filters land
    in the JDBC relations' PushedFilters; only the projected columns are
    fetched (JDBC column pruning)."""
    te = read_jdbc_table(spark, url, "task_executions", driver)
    jobs = read_jdbc_table(spark, url, "jobs", driver)
    vols = read_jdbc_table(spark, url, "volumes", driver)
    from pyspark.sql import functions as F

    etag_hex = F.lower(F.hex(F.col("s3_etag")))
    return (
        te.filter(F.col("status") == "done")
        .join(
            F.broadcast(
                jobs.filter(F.col("name") == job_name).select(
                    F.col("id").alias("job_id")
                )
            ),
            "job_id",
        )
        .join(
            vols.select(
                F.col("id").alias("volume_id"), "bdrc_w_id", "bdrc_i_id"
            ),
            "volume_id",
        )
        .select(
            F.col("bdrc_w_id").alias("w_id"),
            F.col("bdrc_i_id").alias("i_id"),
            etag_hex.alias("etag_hex"),
            F.substring(etag_hex, 1, 6).alias("i_version"),
            "volume_id",
        )
        .orderBy("volume_id")
    )


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


def register_tables_dir(spark: SparkSession, tables_dir: str) -> list[str]:
    """Register every ``<name>.parquet`` under a directory as a temp view
    named ``<name>`` (the testdata sf-dir layout and the extract/quality job
    outputs both follow it). -> sorted registered names."""
    names = []
    for entry in sorted(os.listdir(tables_dir)):
        if entry.endswith(".parquet"):
            name = entry[: -len(".parquet")]
            spark.read.parquet(os.path.join(tables_dir, entry)).createOrReplaceTempView(name)
            names.append(name)
    return names


def sql_repl(spark: SparkSession, names: list[str], limit: int = 50) -> None:
    """Interactive SQL loop over the registered views — the
    `run_custom_query` / `interactive_mode` surface of the reference
    (/root/reference/explore_stats.py:433-514), served by Spark SQL instead
    of DuckDB. `schema` describes every view; errors print and the loop
    continues (never crashes the session)."""
    print(f"tables: {', '.join(names)}")
    print("type 'exit' to quit, 'schema' for table schemas")
    while True:
        try:
            q = input("SQL> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return
        if not q:
            continue
        if q.lower() in ("exit", "quit"):
            return
        if q.lower() == "schema":
            for n in names:
                print(f"\n{n}:")
                spark.sql(f"DESCRIBE {n}").show(100, truncate=False)
            continue
        try:
            spark.sql(q).show(limit, truncate=False)
        except Exception as e:  # keep the loop alive on bad SQL
            print(f"Error: {e}")
