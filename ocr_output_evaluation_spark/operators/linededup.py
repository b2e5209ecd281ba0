"""Line-level deduplication — the CCNet/RefinedWeb boilerplate-removal pass:
drop every line that repeats across the corpus more than a threshold number
of times (navigation bars, cookie banners, footers), keeping document
remainders in original line order.

Reference-repo analog: none (the reference scores OCR confidence at document
granularity); this is part of the training-data operator surface SURVEY
§2.13 adds beyond it. The synthetic corpus has no newlines, so "lines" are
derived deterministically — fixed-width token windows over the normalized
text — and the oracle replays the same derivation (the planted-structure
pattern of `pii_scrub_report`).

Spark-first shape, and how it holds at 100 TB:
- the line-frequency count is ONE hash aggregation over exploded lines;
  each line string of a doc appears in one input partition row, so partial
  aggregation collapses repeats map-side before the exchange.
- the banned set (count >= min_count) is the heavy tail of the line
  distribution — boilerplate repeats millions of times, so the banned
  FRAME is tiny relative to the corpus even when banned OCCURRENCES are a
  large fraction of all lines. It broadcasts; the corpus-side removal is a
  BroadcastHashJoin LeftAnti — the corpus never shuffles for membership.
- reassembly is one per-doc aggregation: sort_array over (pos, line)
  structs then array_join — order restored without a window or a sort of
  the full line frame.
- production runs key the banned set by xxhash64(line) (8-byte wire rows);
  here lines join by their exact strings so DuckDB replays the identical
  pipeline (the md5/xxhash64 twin pattern of operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens


def doc_lines(
    df: DataFrame, text_col: str, id_col: str, line_len: int = 3
) -> DataFrame:
    """-> (id_col, _pos, _line): deterministic line structure — the
    normalized token stream chunked into lines of `line_len` tokens (the
    final line keeps the remainder). Docs with zero tokens contribute no
    rows."""
    toks = word_tokens(F.col(text_col))
    n_lines = F.ceil(F.size(toks) / F.lit(line_len)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(line_len) + F.lit(1), line_len), " "
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.when(n_lines >= 1, lines)).alias("_pos", "_line"),
    )


def banned_lines(lines: DataFrame, min_count: int = 5) -> DataFrame:
    """-> (_line) lines whose corpus-wide occurrence count reaches
    min_count. Partial-aggregated map-side; the result is the boilerplate
    tail — small by construction, broadcast by callers."""
    return (
        lines.groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_line")
    )


def drop_duplicate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 5,
    line_len: int = 3,
) -> DataFrame:
    """-> (id_col, text_dedup, n_lines, n_kept): each document with its
    corpus-duplicated lines removed, remaining lines rejoined in original
    order. Docs whose every line was banned keep a row with an empty
    string; docs with no tokens at all keep a row with NULL text_dedup
    (nothing to dedup)."""
    lines = doc_lines(df, text_col, id_col, line_len)
    banned = banned_lines(lines, min_count)
    kept = lines.join(F.broadcast(banned), "_line", "left_anti")
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda x: x["_line"],
            ),
            " ",
        ).alias("_rebuilt"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.when(F.col("n_lines").isNotNull(), F.coalesce("_rebuilt", F.lit(""))).alias(
                "text_dedup"
            ),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
