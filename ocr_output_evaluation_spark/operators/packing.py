"""Sequence packing — assigning documents to fixed-token-budget training
sequences (the "concat then chunk into L-token sequences" step every LLM
pretraining pipeline runs between corpus and dataloader), plus the packing-
efficiency accounting (sequences produced, boundary-straddling documents,
fill fraction).

Reference-repo analog: none (the reference evaluates documents, it doesn't
build training batches); part of the training-data surface SURVEY §2.13
adds beyond it.

Spark-first shape, and how it holds at 100 TB:
- a GLOBAL running token total would serialize the corpus through one
  partition; instead packing runs per SHARD — the unit a dataloader worker
  consumes — and the window cumsum parallelizes across shards. Shard count
  scales with the cluster; each shard's window sorts only its own rows.
- the shard key here is doc_id % n_shards so DuckDB replays the identical
  pipeline; a production run shards on pmod(xxhash64(id), n) for
  key-skew-proof spreading (the established md5/xxhash64 twin pattern).
- document order within a shard is md5(id) hash order (id tiebreak) —
  deterministic, replayable, and independent of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens: F.Column,
    seq_len: int,
    n_shards: int = 32,
) -> DataFrame:
    """-> (id_col, _shard, _tokens, _seq, _straddle): each document's shard,
    token count, the sequence index its first token lands in (documents are
    concatenated in shard hash-order and chunked every `seq_len` tokens),
    and whether it straddles a sequence boundary. Zero-token documents
    occupy no tokens: they land at the current offset with _straddle
    false."""
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        W.partitionBy("_shard")
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df.select(F.col(id_col), shard.alias("_shard"), tokens.alias("_tokens"))
    out = out.withColumn("_cum", F.sum("_tokens").over(w))
    excl = F.col("_cum") - F.col("_tokens")
    return out.select(
        id_col,
        "_shard",
        "_tokens",
        F.floor(excl / seq_len).cast("long").alias("_seq"),
        (
            (F.col("_tokens") > 0)
            & (F.floor(excl / seq_len) != F.floor((F.col("_cum") - 1) / seq_len))
        ).alias("_straddle"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """-> per-shard packing report: documents, total tokens, sequences
    produced (ceil of the shard's token total over seq_len), mean documents
    per sequence, boundary-straddling documents, and the fill fraction of
    the produced sequences (ANSI-guarded for empty shards)."""
    per_shard = packed.groupBy("_shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("_straddle"), 1).otherwise(0))
        .cast("long")
        .alias("n_straddle"),
    )
    n_seqs = F.ceil(F.col("total_tokens") / F.lit(seq_len)).cast("long")
    return per_shard.select(
        F.col("_shard").alias("shard"),
        "n_docs",
        "total_tokens",
        n_seqs.alias("n_seqs"),
        F.when(n_seqs > 0, F.round(F.col("n_docs") / n_seqs, 6)).alias(
            "avg_docs_per_seq"
        ),
        "n_straddle",
        F.when(
            n_seqs > 0,
            F.round(F.col("total_tokens") / (n_seqs * F.lit(seq_len)), 6),
        ).alias("fill_frac"),
    )
