"""Explicit StructTypes for every table the engine reads or writes.

The reference builds row schemas dynamically from dict unions
(/root/reference/parallel_processor.py:79-86, pd.DataFrame(list_of_dicts));
at 100 TB scale that is a correctness hazard, so every schema here is fixed
and nullable-explicit. See SURVEY.md §1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input (BASELINE.json input_hint): one row per crawled document.
# Analog of the reference's per-page OCR parquet tables
# (/root/reference/stats_calculator.py:104-148 et al.).
# ---------------------------------------------------------------------------
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # raw pre-extraction text, may be NULL
        T.StructField("lang", T.StringType(), True),
    ]
)

# Output of the extraction UDF — one struct per input row. The ``error``
# column is the per-row failure-isolation channel (analog of the reference's
# per-volume try/except, /root/reference/parallel_processor.py:90-95):
# extraction never kills the job, it tags the row.
EXTRACTION_RESULT = T.StructType(
    [
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("text_sha256", T.StringType(), True),
        T.StructField("n_blocks_kept", T.IntegerType(), True),
        T.StructField("n_blocks_dropped", T.IntegerType(), True),
        T.StructField("is_pdf", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# Extracted-documents table written by the pipeline (plans/pipeline.py).
EXTRACTED_DOCS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("text_sha256", T.StringType(), True),
        T.StructField("n_blocks_kept", T.IntegerType(), True),
        T.StructField("n_blocks_dropped", T.IntegerType(), True),
        T.StructField("is_pdf", T.BooleanType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("extraction_version", T.StringType(), False),
    ]
)

# Per-document confidence arrays — analog of the per-page OCR confidence
# column (float16 at /root/reference/stats_calculator.py:66-68; stored FLOAT,
# aggregated DOUBLE to reproduce the overflow defense).
TOKEN_CONFIDENCES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("token_confs", T.ArrayType(T.FloatType()), True),
    ]
)

# Broadcastable char-ngram LM — replaces KenLM+SentencePiece
# (/root/reference/perplexity_scorer.py:84-135) with a joinable table.
REFERENCE_LM = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("ngram", T.StringType(), False),
        T.StructField("logp", T.DoubleType(), False),
    ]
)

# Dimension tables — analogs of print_methods.csv / scripts.csv
# (/root/reference/metadata_loader.py:27-44).
DOMAINS_DIM = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)
LANGS_DIM = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("script", T.StringType(), True),
        T.StructField("family", T.StringType(), True),
    ]
)

# Per-document metrics — the analog of the reference's per-volume stats row
# (~45 dynamic columns, /root/reference/stats_calculator.py:73-99 +
# perplexity_scorer.py:239-272), made explicit.
DOC_METRICS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("n_confs", T.LongType(), True),
        T.StructField("mean_conf", T.DoubleType(), True),
        T.StructField("median_conf", T.DoubleType(), True),
        T.StructField("std_conf", T.DoubleType(), True),
        T.StructField("min_conf", T.DoubleType(), True),
        T.StructField("max_conf", T.DoubleType(), True),
        T.StructField("p10_conf", T.DoubleType(), True),
        T.StructField("p25_conf", T.DoubleType(), True),
        T.StructField("p75_conf", T.DoubleType(), True),
        T.StructField("p90_conf", T.DoubleType(), True),
        T.StructField("p95_conf", T.DoubleType(), True),
        T.StructField("n_high_conf", T.LongType(), True),   # >= 0.9
        T.StructField("n_med_conf", T.LongType(), True),    # [0.7, 0.9)
        T.StructField("n_low_conf", T.LongType(), True),    # < 0.7
        T.StructField("n_nan_conf", T.LongType(), True),    # NaN class (distinct from inf)
        T.StructField("n_inf_conf", T.LongType(), True),    # inf class
        T.StructField("perplexity", T.DoubleType(), True),  # NULL=no scoreable text, inf=LM rejection
        T.StructField("error", T.StringType(), True),       # extraction error, carried through for rollup counters
        T.StructField("extraction_version", T.StringType(), True),
    ]
)

# Checkpoint/lineage manifest — resume unit is a url-hash bucket
# (analog of skip-if-output-exists, /root/reference/analyze_confidence.py:75-80).
MANIFEST = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("source_snapshot_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("error_count", T.LongType(), False),
        T.StructField("extraction_version", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

# Multimodal payload table — image/audio/video as opaque binary + typed metadata.
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)
