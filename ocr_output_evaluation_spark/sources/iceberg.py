"""Iceberg integration — the north-rule table format, concretely gated.

The target deployment reads/writes Iceberg tables (url-hash `bucket(n, col)`
partition transforms, snapshot ids in the resume manifest's lineage). This
container ships no iceberg-spark-runtime jar, so every entry point here
probes the JVM once and takes the identical-shape parquet path when the jar
is absent — the cluster switch is a spark-submit `--packages`/conf change,
not a code change:

    spark-submit --py-files ooe_spark.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      $(python -c "from ocr_output_evaluation_spark.sources.iceberg import \\
                   iceberg_confs, conf_args; print(conf_args(iceberg_confs('ooe', 's3://bucket/wh')))") \\
      jobs.py extract --source ooe.crawl.web_pages --out ooe.crawl.extracted

Reference analog: none (the reference reads loose S3 parquet files,
parallel_processor.py:73); the Iceberg layer is the rebuild's scale story —
snapshot isolation for resume lineage, bucket transforms for co-located
joins, partition pruning on `bucket` for the resume anti-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
_EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def _is_path(target: str) -> bool:
    """Same path-vs-catalog heuristic as io.read_table (review r2: a weaker
    '/'-based check misclassified relative paths as catalog names)."""
    return os.path.sep in target or target.endswith(".parquet")


def iceberg_confs(catalog: str, warehouse: str, catalog_type: str = "hadoop") -> dict[str, str]:
    """The session confs an Iceberg deployment needs — returned as data so
    callers can feed spark-submit, SparkSession.builder, or tests alike."""
    return {
        "spark.sql.extensions": _EXTENSIONS,
        f"spark.sql.catalog.{catalog}": _CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def conf_args(confs: dict[str, str]) -> str:
    """Render confs as spark-submit --conf arguments."""
    return " ".join(f"--conf {k}={v}" for k, v in confs.items())


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_CATALOG_IMPL)
        return True
    except Exception:
        return False


def write_table_any(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    bucket_col: str | None = None,
    n_buckets: int = 32,
) -> str:
    """Write to an Iceberg table (catalog name target) when the runtime is
    present, else a parquet directory (path target) — same call shape.

    ``bucket_col`` is a RAW column (e.g. the url): BOTH branches hash it
    into exactly ``n_buckets`` partitions — Iceberg via its `bucket(n, col)`
    transform, parquet via an explicit `pmod(xxhash64(col), n)` partition
    column named ``{bucket_col}_bucket`` (review r2: a raw `partitionBy` on
    a high-cardinality column would create one directory per value, and the
    two branches would otherwise produce structurally different layouts).
    The hash functions differ between formats (Iceberg murmur3 vs xxhash64),
    so bucket IDS are format-specific — resume manifests never mix formats
    because the snapshot lineage id differs too (``snapshot_id``). An
    already-bucketed INT column should be passed through a plain writer
    (io.write_parquet partition_by), not re-hashed here.
    Returns which branch ran ('iceberg' | 'parquet')."""
    if bucket_col and bucket_col not in df.columns:
        # fail loudly and identically in BOTH branches: the Iceberg branch
        # would raise at analysis, but the parquet branch used to silently
        # write an unpartitioned table on a typo'd column name (ADVICE r2)
        raise ValueError(
            f"write_table_any: bucket_col {bucket_col!r} not in dataframe "
            f"columns {df.columns}"
        )
    if iceberg_available(spark) and not _is_path(target):  # pragma: no cover
        from pyspark.sql.functions import bucket, col

        w = df.writeTo(target)
        if bucket_col:
            w = w.partitionedBy(bucket(n_buckets, col(bucket_col)))
        w.createOrReplace()
        return "iceberg"
    from pyspark.sql import functions as F

    if bucket_col:
        # underscore prefix = engine-internal layout column: Iceberg's
        # bucket transform is HIDDEN partitioning, so the parquet twin's
        # partition column must not leak into the logical schema either —
        # read_table_any strips _bucket_* on read (review r2-b)
        pcol = f"_bucket_{bucket_col}"
        df = df.withColumn(
            pcol, F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
        )
        w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        w.partitionBy(pcol).parquet(target)
    else:
        df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(target)
    return "parquet"


def read_table_any(spark: SparkSession, target: str) -> DataFrame:
    """spark.read.table for catalog names, parquet for paths — the single
    call sites in plans/* stay format-agnostic. Path detection matches
    io.read_table (path separator or .parquet suffix). ``_bucket_*``
    columns (write_table_any's parquet stand-in for Iceberg's hidden bucket
    partitioning) are stripped so both branches expose the SAME logical
    schema; partition pruning on them still applies before the projection."""
    if iceberg_available(spark) and not _is_path(target):  # pragma: no cover
        return spark.read.table(target)
    df = spark.read.parquet(target)
    internal = [c for c in df.columns if c.startswith("_bucket_")]
    return df.drop(*internal) if internal else df


def snapshot_id(spark: SparkSession, target: str) -> str:
    """The lineage id the resume manifest records per run. Iceberg: the
    current snapshot id from the table's metadata (time-travel-stable);
    parquet fallback: the path itself (the manifest additionally scopes by
    bucket count — sources/manifest.py)."""
    if iceberg_available(spark) and not _is_path(target):  # pragma: no cover
        row = spark.sql(
            f"SELECT snapshot_id FROM {target}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row.snapshot_id)
    return target
