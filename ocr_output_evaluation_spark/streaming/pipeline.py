"""Structured Streaming layer.

The reference is purely batch (SURVEY.md §2.11) — this module is the
rebuild's forward extension: the SAME extraction UDF and schemas run as an
incremental pipeline, because at 10^12-document scale "the crawl" is not a
static table but an arriving feed. Design mirrors the batch pipeline
(plans/pipeline.py):

- file-source streaming over the web_pages layout (new parquet files under a
  directory = new micro-batch; an Iceberg/Kafka source is a one-line swap),
- the identical Arrow-batched ``extract_udf`` (byte-identity therefore holds
  per micro-batch by construction),
- event-time analytics on ``warc_ts`` with watermarking for late data,
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-lang totals) — the streaming analog of the checkpoint-manifest resume
  counters,
- ``trigger(availableNow=True)`` everywhere in tests: process-everything-
  then-stop gives deterministic, CI-friendly runs with real checkpoints.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..extract.udf import domain_of, extract_udf
from ..schema import WEB_PAGES


def read_web_pages_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over a web_pages parquet directory. Streaming scans
    require an explicit schema (no inference) — ours is fixed anyway.
    ``max_files_per_trigger`` bounds micro-batch size (and is what the
    kill/resume drill uses to force multiple batches over a small fixture)."""
    return (
        spark.readStream.schema(WEB_PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_extraction(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Incremental extraction: stream-in pages → prune columns → extract →
    append extracted rows to parquet. The checkpoint dir carries source
    offsets, so a restart resumes exactly after the last committed batch —
    the streaming twin of the batch manifest (sources/manifest.py)."""
    pages = read_web_pages_stream(spark, source_dir, max_files_per_trigger)
    extracted = (
        pages.select("url", "warc_ts", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select(
            "url",
            domain_of("url").alias("domain"),
            "warc_ts",
            "lang",
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.text_sha256").alias("text_sha256"),
            F.col("x.is_pdf").alias("is_pdf"),
            F.col("x.error").alias("error"),
        )
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_within_watermark(
    extracted: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop arriving documents whose extracted text
    (sha256) was already seen within the event-time watermark.

    Scale design: a plain streaming ``dropDuplicates`` would grow its state
    forever at crawl scale; ``dropDuplicatesWithinWatermark`` bounds state to
    the watermark horizon — the right contract for a crawl feed, where
    same-content re-fetches cluster in time. Cross-horizon (historical)
    dedup stays the batch export's job (plans/export.py), exactly like the
    manifest-vs-checkpoint split between the batch and streaming pipelines.

    Error rows carry a NULL text_sha256; deduping on NULL would collapse
    every failed extraction into one surviving row, so the dedup key falls
    back to (url, warc_ts) for them — i.e. error rows dedup per url+fetch
    within the watermark rather than passing a flood of identical retries.
    The url is NULL-guarded (ADVICE r1): `concat` is NULL-absorbing, and an
    unguarded NULL url would collapse every NULL-url error row into one.
    With the guard, NULL-url errors still dedup per warc_ts; rows NULL in
    BOTH url and warc_ts are indistinguishable to any streaming key — the
    source contract (schema.WEB_PAGES) requires url NOT NULL upstream."""
    keyed = extracted.withColumn(
        "_dedup_key",
        F.coalesce(
            F.col("text_sha256"),
            F.concat(
                F.lit("err:"),
                F.coalesce(F.col("url"), F.lit("\0nourl")),
                F.lit(":"),
                F.coalesce(F.col("warc_ts").cast("string"), F.lit("\0nots")),
            ),
        ),
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )


def stream_dedup_extraction(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Incremental extract-and-dedup: the stream_extraction plan with the
    watermarked exact-dedup stage before the sink — the streaming twin of
    the export pipeline's exact-dedup window."""
    pages = read_web_pages_stream(spark, source_dir)
    extracted = (
        pages.select("url", "warc_ts", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select(
            "url",
            domain_of("url").alias("domain"),
            "warc_ts",
            "lang",
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.text_sha256").alias("text_sha256"),
            F.col("x.is_pdf").alias("is_pdf"),
            F.col("x.error").alias("error"),
        )
    )
    deduped = dedup_within_watermark(extracted, watermark=watermark)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_lang_counts(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed rollup with late-data handling: tumbling windows
    over ``warc_ts``, watermarked so state for closed windows is dropped —
    the streaming twin of the per-lang batch rollups (A11)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("raw_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
            "raw_chars",
        )
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    the (batch) dimension table — Spark plans this as a per-batch join with
    NO streaming state (the static side is re-scanned/broadcast per batch,
    so dim updates between batches are picked up). The streaming twin of
    the batch metadata-enrichment layer (J1 / metadata_loader.py:109-146).
    Left join: pages with no dim row keep NULL enrichment — the stream must
    never drop rows because a dimension is incomplete."""
    return stream.join(F.broadcast(dim), on, "left")


RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("batch_pages", T.LongType(), False),
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)


def _update_running_totals(key, pdf_iter, state: GroupState):
    """Per-lang cumulative counters carried in explicit group state. The
    per-batch work is vectorized pandas; state holds two longs per key, so
    state size is bounded by the lang cardinality — safe at any scale."""
    (lang,) = key
    batch_pages = 0
    batch_chars = 0
    for pdf in pdf_iter:
        batch_pages += len(pdf)
        batch_chars += int(pdf["n_chars"].fillna(0).sum())
    if state.exists:
        total_pages, total_chars = state.get
    else:
        total_pages, total_chars = 0, 0
    total_pages += batch_pages
    total_chars += batch_chars
    state.update((total_pages, total_chars))
    yield pd.DataFrame(
        [
            {
                "lang": lang,
                "batch_pages": batch_pages,
                "total_pages": total_pages,
                "total_chars": total_chars,
            }
        ]
    )


def running_lang_totals(pages: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-lang
    page/char totals across micro-batches."""
    prepared = pages.select(
        "lang", F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars")
    )
    return prepared.groupBy("lang").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
