"""Checkpoint / lineage manifest — resumable extraction (SURVEY.md §7 D4).

The reference resumes by skipping volumes whose output file exists
(/root/reference/analyze_confidence.py:75-80). At 10^12 documents "a file per
unit" doesn't survive; the rebuild's resume unit is a *url-hash bucket* and
the ledger is a small append-only parquet table:

    manifest(run_id, source_snapshot_id, bucket, row_count, error_count,
             extraction_version, status, finished_at)

A (re)run lists completed buckets for (source_snapshot_id,
extraction_version) and processes only the complement — so a killed run
resumes where it stopped, a changed extractor version reprocesses everything,
and a changed snapshot reprocesses everything. Idempotent by construction:
outputs are written partitioned by bucket with dynamic partition overwrite,
so re-processing a bucket replaces exactly that bucket's files.

On a real cluster this table would be an Iceberg table with snapshot
isolation; parquet-append keeps the same semantics single-writer (the only
writer is the driver, once per bucket batch, after the data commit).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import MANIFEST


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    if not os.path.exists(manifest_path):
        return spark.createDataFrame([], schema=MANIFEST)
    return spark.read.schema(MANIFEST).parquet(manifest_path)


def completed_buckets(
    spark: SparkSession,
    manifest_path: str,
    source_snapshot_id: str,
    extraction_version: str,
) -> list[int]:
    m = read_manifest(spark, manifest_path)
    rows = (
        m.filter(
            (F.col("source_snapshot_id") == source_snapshot_id)
            & (F.col("extraction_version") == extraction_version)
            & (F.col("status") == "done")
        )
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(r.bucket for r in rows)


def append_manifest(spark: SparkSession, manifest_path: str, rows: list[dict]) -> None:
    """Append one ledger row per completed bucket. Called once per run after
    the data write commits — crash before this append means the buckets are
    simply re-done (idempotent overwrite), never double-counted."""
    df = spark.createDataFrame(
        [
            (
                r["run_id"],
                r["source_snapshot_id"],
                int(r["bucket"]),
                int(r["row_count"]),
                int(r["error_count"]),
                r["extraction_version"],
                r.get("status", "done"),
                r.get("finished_at"),
            )
            for r in rows
        ],
        schema=MANIFEST,
    )
    df.repartition(1).write.mode("append").parquet(manifest_path)
