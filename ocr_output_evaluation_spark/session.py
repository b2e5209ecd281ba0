"""SparkSession factory with the engine's standard configuration.

Local-mode testing uses ``local[N]``; the same config block is what a
``spark-submit --py-files`` cluster deployment would carry in spark-defaults.
All knobs are chosen for the 100 TB design point (AQE on, skew-join on,
Arrow-vectorized Python) and merely *also* work on local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partition default: ~2-3x core count locally; a real cluster run
# overrides this (AQE coalescing makes the initial number less critical).
_DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "ocr_output_evaluation_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so tests
    and bench share one code path.
    """
    if master is None:
        # Under spark-submit the JVM gateway already exists and carries the
        # real --master (PYSPARK_GATEWAY_PORT is set in the driver env) —
        # forcing local[] there would silently run a "cluster" job on the
        # driver. Only default to local mode when we own the JVM.
        if "PYSPARK_GATEWAY_PORT" not in os.environ:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
            master = f"local[{cpus}]"
    # Make this package importable inside Python UDF workers regardless of the
    # driver's cwd. Local mode: workers inherit the driver env, so extending
    # PYTHONPATH before the JVM starts is sufficient. Cluster mode: ship the
    # package with ``spark-submit --py-files ocr_output_evaluation_spark.zip``
    # (the north rule's deployment shape); this env tweak is then a no-op.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or _DEFAULT_SHUFFLE_PARTITIONS,
        )
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        # The north rule requires explicit skew handling too (operators/salted.py);
        # AQE is the safety net, salting is the design.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Oracle comparisons (DuckDB) are UTC-naive; pin the session TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # Bucketed scans unconditionally: Spark's DisableUnnecessaryBucketedScan
        # otherwise downgrades filter-only scans of bucketed tables to plain
        # file scans, silently DISCARDING bucket pruning (measured on the ANN
        # index probe). The only bucketed tables in this engine are ANN
        # indexes and co-located-join tables — both always want bucketed
        # reads — and setting it here (not per-query) keeps plans identical
        # regardless of query order (review r2).
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        # Arrow for every pandas UDF / createDataFrame / toPandas hop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Extraction UDF batch size: bounds the per-batch memory of html blobs
        # (10k rows x ~4 KiB html ~= 40 MiB per Arrow batch).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
