"""X63 — passage chunking: split documents into fixed-token windows
with stride/overlap — the universal preprocessing step for long-context
pretraining and retrieval corpora (the RAG chunker; the sliding-window
segmentation of BERT's long-document handling, Devlin et al. 2019
appendix; dense-retrieval passage construction, Karpukhin et al. 2020
§4.1 "100-word passages").
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Semantics: token positions are the 1-based indices of the
space-delimited tokens; chunk i starts at 1 + i*stride and spans up to
``window`` tokens; the number of chunks is 1 + ceil((n - window)/stride)
for n > window else 1 (the standard formulation: every token is covered,
consecutive chunks overlap by window - stride, the final chunk may be
short). All-integer arithmetic, so both engines enumerate identical
chunk grids.

Spark-first shape: one explode of the in-row start grid (codegen
sequence over integers — no UDF, no shuffle: chunking is embarrassingly
row-local), `slice` + `array_join` to materialize each passage, token
counts and md5 fingerprints as plain expressions. At 100 TB the chunk
frame is written straight through the partitioned sink; nothing
aggregates unless the caller asks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """-> (id, chunk_idx, start_tok, n_tokens, chunk_text): the stride
    grid over each document's tokens. Documents with no tokens yield no
    chunks; ``stride`` must be >= 1 (and <= window for full coverage)."""
    if stride < 1:
        raise ValueError("chunk_documents: stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # ceil((n - window)/stride) from the already-computed size column —
    # floor on a positive double is exact well past any real token count
    n_extra = F.when(
        n > window,
        F.floor((n - F.lit(window) + F.lit(stride - 1)) / F.lit(stride)),
    ).otherwise(F.lit(0))
    grid = F.sequence(F.lit(0), n_extra)
    e = (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(grid).alias("chunk_idx"),
        )
        .withColumn("start_tok", F.col("chunk_idx") * stride + 1)
    )
    piece = F.slice(F.col("_toks"), F.col("start_tok"), window)
    return e.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
