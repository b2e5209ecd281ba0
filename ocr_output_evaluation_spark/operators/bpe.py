"""BPE merge-pair mining — the pair-statistics inner loop of byte-pair-
encoding vocabulary training: count adjacent symbol pairs across the corpus
weighted by word frequency; the top pair is the next merge.

Reference-repo analog: none (the reference consumes OCR text, it doesn't
train tokenizers); part of the training-data operator surface SURVEY §2.13
adds beyond it.

Spark-first shape, and how it holds at 100 TB:
- word frequencies are ONE hash aggregation over exploded tokens,
  partial-aggregated map-side (repeated words collapse before the wire).
- pair statistics run over the DISTINCT-WORD frame, weighted by the word
  counts — the standard BPE-trainer optimization: the expensive explode
  scales with VOCABULARY size (stays in the millions however big the
  corpus gets), not corpus size.
- the merge ranking is a top-k with a total order (count desc, pair asc)
  → TakeOrderedAndProject, no global sort.
- pairs are generated in-row (codegen transform over a sequence of
  substr slices), all positions counted including overlaps — matching the
  common reference implementations' pair-statistics step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.ngram import word_tokens


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """-> (word, wcount): corpus-wide frequency of each normalized token."""
    return (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def merge_pair_counts(words: DataFrame) -> DataFrame:
    """-> (pair, total_count, n_words) over a (word, wcount) frame: each
    adjacent character pair of each distinct word, total_count = pair
    occurrences weighted by word frequency, n_words = distinct words
    containing the pair. Words shorter than 2 chars contribute nothing."""
    pairs = words.select(
        "word",
        "wcount",
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substr(F.col("word"), i, F.lit(2)),
                ),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("wcount").cast("long").alias("total_count"),
        F.countDistinct("word").cast("long").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# Iterative training + encode (X36) — completes the tokenizer loop: X27 mined
# single-pass pair stats; this trains REAL rank-ordered merges (re-counting
# pair stats after each merge, Sennrich et al. 2016, arXiv:1508.07909
# "get_stats/merge_vocab" loop) and applies them, yielding per-word BPE token
# counts. Reference analog: none (training-data layer, SURVEY §2.13).
#
# Scale shape: every step runs over the DISTINCT-WORD frame (vocabulary-
# scale — bounded in the millions however big the corpus), exactly the X27
# argument; each step is one explode→map-side-combined agg for pair stats,
# one 1-row collect (the argmax pair — a query-vector collect, allowed), and
# one interpreted fold (F.aggregate) applying the merge. localCheckpoint
# between steps truncates the fold lineage so step N's plan doesn't nest N
# interpreted aggregates. The corpus is touched exactly twice end-to-end:
# once to mine word frequencies, once to map word→token-count back on
# (vocab frame joined broadcast).
#
# Merge application is a left-to-right fold with the accumulated sequence as
# a space-joined string: if the accumulator's last symbol == a and the next
# symbol == b, append WITHOUT the separator (which IS replacing last with
# a||b); else append with it. This reproduces BPE's leftmost-non-overlapping
# semantics ("l l l" + (l,l) -> "ll l"), and applying merges in rank order
# is equivalent to the min-rank-present loop because a merge can only create
# pairs of later rank than itself. DuckDB replays the identical fold with
# list_reduce (which seeds the accumulator with the first element, matching
# F.aggregate's explicit init here), making the WHOLE training loop
# SQL-oracle-checkable when unrolled one CTE block per merge.
# ---------------------------------------------------------------------------
def _apply_merge(seq: Column, a: str, b: str) -> Column:
    """One merge pass over a space-joined symbol sequence (non-empty)."""
    syms = F.split(seq, " ")
    return F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (F.substring_index(acc, " ", -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def train_bpe(
    words: DataFrame, n_merges: int
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Iterative BPE training over a (word, wcount) frame.

    Returns (trained frame (word, wcount, seq) where seq is the space-joined
    symbol sequence after all merges, ordered merge list [(a, b), ...]).
    Each step's best pair is the (count desc, a asc, b asc) argmax of
    adjacent-symbol pair counts weighted by wcount (all positions counted,
    overlaps included — Sennrich's get_stats). Stops early if no pair is
    left (every word a single symbol). Words must be non-empty strings.
    """
    w = words.select(
        "word", "wcount", F.concat_ws(" ", F.split("word", "")).alias("seq")
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        w = w.localCheckpoint()
        syms = F.split("seq", " ")
        n = F.size(syms)
        pairs = w.select(
            "wcount",
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                    F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wcount").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        w = w.withColumn("seq", _apply_merge(F.col("seq"), a, b))
    return w.localCheckpoint(), merges


def bpe_vocab(trained: DataFrame) -> DataFrame:
    """(word, n_tok) — per-word token count after training: the frame to
    broadcast-join back onto the corpus's exploded words."""
    return trained.select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("n_tok")
    )


# ---------------------------------------------------------------------------
# WordPiece training (X44) — completes the tokenizer family (BPE X36,
# unigram-LM X41, WordPiece here). Reference analog: none (training-data
# layer, SURVEY §2.13).
#
# WordPiece (Schuster & Nakajima 2012; the BERT tokenizer per Wu et al.
# 2016 §4.1 / Devlin et al. 2019) differs from BPE in ONE place: the merge
# argmax. BPE takes the most FREQUENT adjacent pair; WordPiece takes the
# pair maximizing the unigram-LM likelihood gain
#
#     score(a, b) = count(ab) / (count(a) * count(b))
#
# over the CURRENT segmentation — a cohesion ratio, so a rare pair whose
# halves only ever occur together beats a frequent pair of promiscuous
# units. (The "##" continuation glyph is a display convention for the
# learned pieces, not part of the selection loop; symbols here are plain
# substrings, as in X36.)
#
# Exact replayability (the X29/X39/X40 quantize-the-loop-state trick): the
# ratio is never computed in floats. Both engines rank by the BIGINT
#
#     nano_score = (count(ab) * 10^9) DIV (count(a) * count(b))
#
# — positive-integer truncating division, identical in Spark (`div`) and
# DuckDB (`//`) — with (a, b) ascending tie-break on quantized collisions.
# The selected trajectory is therefore bit-identical in both engines and
# the whole trainer unrolls as SQL CTEs exactly like X36's. At 10^9-scale
# unit counts the products approach BIGINT range; production would widen
# the arithmetic to DECIMAL(38,0) — at that point the corpus is large
# enough that quantization collisions are the least of one's worries.
#
# Scale shape: identical to train_bpe (every step vocabulary-scale over
# the distinct-word frame) plus one extra map-side-combined agg per step
# (the per-symbol unit census) and two joins of the pair frame against
# that census — the census is at most |alphabet| + n_merges rows, so both
# joins broadcast it.
# ---------------------------------------------------------------------------
_WP_SCALE = 1_000_000_000


def train_wordpiece(
    words: DataFrame, n_merges: int
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Iterative WordPiece training over a (word, wcount) frame.

    Returns (trained frame (word, wcount, seq), ordered merge list) exactly
    like train_bpe; only the per-step argmax differs (likelihood score,
    see module comment). Words must be non-empty strings.
    """
    w = words.select(
        "word", "wcount", F.concat_ws(" ", F.split("word", "")).alias("seq")
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        w = w.localCheckpoint()
        syms = F.split("seq", " ")
        n = F.size(syms)
        units = (
            w.select("wcount", F.explode(syms).alias("s"))
            .groupBy("s")
            .agg(F.sum("wcount").cast("long").alias("ucnt"))
        )
        pairs = w.select(
            "wcount",
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                    F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
                )
            ).alias("p"),
        )
        pc = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wcount").cast("long").alias("cnt"))
        )
        scored = (
            pc.join(
                F.broadcast(units.select(F.col("s").alias("a"),
                                         F.col("ucnt").alias("ua"))),
                "a",
            )
            .join(
                F.broadcast(units.select(F.col("s").alias("b"),
                                         F.col("ucnt").alias("ub"))),
                "b",
            )
            .select(
                "a",
                "b",
                F.expr(
                    f"(cnt * CAST({_WP_SCALE} AS BIGINT)) div (ua * ub)"
                ).alias("score"),
            )
        )
        best = scored.orderBy(F.col("score").desc(), "a", "b").limit(1).collect()
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        w = w.withColumn("seq", _apply_merge(F.col("seq"), a, b))
    return w.localCheckpoint(), merges
