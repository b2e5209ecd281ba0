"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship per-lang quality rollup at sf0.001;
``queries``/``oracle_sql`` expose the operator registry from
``ocr_output_evaluation_spark.queries`` (SURVEY.md §2 coverage — each Spark
implementation paired with the DuckDB-equivalent ANSI SQL where the operator
is SQL-expressible; xxhash64/UDF-based ops are rows-only checked).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_output_evaluation_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-lang document-quality
    rollup (token counts, quality score, moment stats, dup counts) — the
    EP1-analog report of the engine."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.functions.text import (
        bpe_ish_token_count,
        quality_score,
        whitespace_token_count,
    )
    from ocr_output_evaluation_spark.functions.valid import valid

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    v = valid("n_chars")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.mean(v), 6).alias("mean_chars"),
        F.round(F.median(v), 6).alias("median_chars"),
        F.round(F.percentile(v, F.lit(0.9)), 6).alias("p90_chars"),
        F.sum(whitespace_token_count(F.col("text"))).alias("total_ws_tokens"),
        F.sum(bpe_ish_token_count(F.col("text"))).alias("total_bpe_tokens"),
        F.round(F.avg(quality_score(F.col("text"), "en")), 6).alias("avg_quality"),
        F.countDistinct(fp).alias("n_unique_texts"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(ORACLES)
