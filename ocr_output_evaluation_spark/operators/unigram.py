"""Unigram-LM tokenizer training (SentencePiece-style) — Viterbi
segmentation against a substring vocabulary with iterative re-estimation.

The published recipe (Kudo 2018, "Subword Regularization", arXiv:1804.10959
— the unigram language model of SentencePiece): seed a vocabulary with the
corpus' frequent substrings, then alternate (a) Viterbi-segmenting every
word into the most probable piece sequence under the current piece
probabilities and (b) re-estimating piece probabilities from the usage
counts. This module implements the bounded deterministic core — hard-EM
(Viterbi counts, the common practical approximation), a FIXED vocabulary
after seeding (top-S substrings + all single characters, so every word is
always reachable; no gradual pruning), words truncated to `max_word_len`
chars, a fixed round count — which makes the whole trajectory exactly
replayable in ANSI SQL. Reference-repo analog: none (training-data layer,
SURVEY §2.13); completes the tokenizer family next to BPE (X27/X36).

Spark-first shape, and how it holds at 100 TB:
- everything after word counting runs over the DISTINCT-WORD frame
  (vocabulary scale — millions of rows however big the corpus, the X27/X36
  argument). The corpus itself is scanned twice: once for word
  frequencies, once to apply the learned word→token-count map (broadcast).
- the Viterbi DP is ONE in-row fold per word (positions × ≤L candidate
  piece lengths), with the piece-cost table riding in the expression as a
  literal map (tiny: S + alphabet entries). No join, no shuffle inside a
  round; each round's usage recount is one map-side-combined explode-agg
  over the word frame.
- determinism / oracle parity: piece costs are integer NANO-LOG probs
  (F.round(F.log(...)*1e9) computed by Spark on the tiny vocab frame, the
  DSIR X39 recipe) so DP scores are exact BIGINT sums; the DP tie rule is
  fixed (max score, then LONGEST last piece — array_max over
  struct(score, piece_len, pieces) ≡ SQL ORDER BY s DESC, l DESC); seeds
  rank by (count desc, piece asc). No RNG, no floats in any comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .bpe import word_frequencies

NEG_INF = -(10**15)  # smaller than any reachable DP score


def truncated_words(docs: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """-> (w, wc): distinct normalized words truncated to max_word_len
    chars (the SentencePiece max-input-length bound), frequencies summed
    across truncation collisions."""
    wf = word_frequencies(docs, text_col)
    return (
        wf.select(
            F.substring("word", 1, max_word_len).alias("w"), "wcount"
        )
        .groupBy("w")
        .agg(F.sum("wcount").cast("long").alias("wc"))
    )


def _substrings(w: Column, lo: int, hi: int) -> Column:
    """ARRAY<STRING> of all substrings of w with length in [lo, hi] —
    flattened (start, len) grid, codegen transforms only."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(lo), F.lit(hi)),
                    lambda l: F.when(i + l - 1 <= F.length(w), w.substr(i, l)),
                ),
                lambda p: p.isNotNull(),
            ),
        )
    )


def seed_vocab(
    words: DataFrame, piece_len: int = 4, top_s: int = 40
) -> DataFrame:
    """-> (piece, cnt): the top-S multi-char substrings by weighted count
    (ties → lexicographically first) plus ALL single characters (words stay
    reachable whatever the DP prunes implicitly). Vocabulary is FIXED after
    this step."""
    subs = (
        words.select(
            F.explode(_substrings(F.col("w"), 2, piece_len)).alias("piece"), "wc"
        )
        .groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("cnt"))
    )
    top = subs.orderBy(F.desc("cnt"), "piece").limit(top_s)
    chars = (
        words.select(F.explode(_substrings(F.col("w"), 1, 1)).alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("cnt"))
    )
    return top.unionByName(chars.join(top, "piece", "left_anti"))


def vocab_costs(vocab: DataFrame) -> list[tuple[str, int]]:
    """-> [(piece, nano_log_cost)] collected (tiny: S + alphabet rows).
    cost = round(ln((cnt+1)/(total+V)) * 1e9) as BIGINT, computed BY SPARK
    on the vocab frame so the DuckDB oracle twin (identical expression)
    reproduces it bit-exactly — the X39 nano-log recipe."""
    from pyspark.sql import Window as W

    tot = W.partitionBy(F.lit(1))
    c = (
        vocab.select(
            "piece",
            F.round(
                F.log(
                    (F.col("cnt") + 1.0)
                    / (F.sum("cnt").over(tot) + F.count(F.lit(1)).over(tot))
                )
                * 1e9
            )
            .cast("long")
            .alias("cost"),
        )
        .collect()
    )
    return [(r.piece, int(r.cost)) for r in c]


def viterbi_expr(
    w: Column, costs: list[tuple[str, int]], max_word_len: int, piece_len: int
) -> Column:
    """In-row Viterbi DP: -> struct(s BIGINT total nano-log score,
    p STRING the piece sequence, space-joined with a leading space).

    One fold over positions 1..len(w); at each position the ≤piece_len
    candidate last-pieces are scored from the accumulated prefix bests and
    the literal cost map; array_max over struct(score, piece_len, pieces)
    picks max score with LONGEST-piece tie-break. Single chars are always
    in the map, so every position is reachable."""
    cm = F.create_map(
        *[x for p, c in costs for x in (F.lit(p), F.lit(int(c)).cast("long"))]
    )

    def step(acc, j):
        def cand(l):
            piece = w.substr(j - F.lit(l) + 1, F.lit(l))
            c = F.element_at(cm, piece)
            prev = F.element_at(acc, j - F.lit(l) + 1)  # acc[0] is pos 0
            return F.when(
                (j >= l) & c.isNotNull(),
                F.struct(
                    (prev["s"] + c).alias("s"),
                    F.lit(l).alias("l"),
                    F.concat(prev["p"], F.lit(" "), piece).alias("p"),
                ),
            )

        best = F.array_max(
            F.filter(
                F.array(*[cand(l) for l in range(1, piece_len + 1)]),
                lambda x: x.isNotNull(),
            )
        )
        return F.concat(
            acc, F.array(F.struct(best["s"].alias("s"), best["p"].alias("p")))
        )

    init = F.array(
        F.struct(F.lit(0).cast("long").alias("s"), F.lit("").alias("p"))
    )
    fin = F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)
    return F.element_at(fin, F.length(w) + 1)


def train_unigram(
    docs: DataFrame,
    text_col: str,
    max_word_len: int = 10,
    piece_len: int = 4,
    top_s: int = 40,
    rounds: int = 2,
) -> DataFrame:
    """Train the unigram tokenizer and segment the word frame.

    -> (w, wc, n_tokens, seg) — one row per distinct (truncated) word with
    its final Viterbi piece count and segmentation. Each round: costs
    collected from the tiny vocab frame, DP applied in-row over the word
    frame, usage recounted map-side (pieces with zero usage stay in the
    vocab at the smoothing floor — the fixed-vocab bounded variant)."""
    words = truncated_words(docs, text_col, max_word_len)
    vocab = seed_vocab(words, piece_len, top_s)
    for r in range(rounds):
        costs = vocab_costs(vocab)
        seg = words.withColumn(
            "_v", viterbi_expr(F.col("w"), costs, max_word_len, piece_len)
        )
        if r == rounds - 1:
            break
        use = (
            seg.select(
                F.explode(F.split(F.ltrim(F.col("_v")["p"]), " ")).alias("piece"),
                "wc",
            )
            .groupBy("piece")
            .agg(F.sum("wc").cast("long").alias("cnt"))
        )
        vocab = vocab.select("piece").join(use, "piece", "left").select(
            "piece", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
        )
    return seg.select(
        "w",
        "wc",
        F.size(F.split(F.ltrim(F.col("_v")["p"]), " ")).cast("long").alias(
            "n_tokens"
        ),
        F.ltrim(F.col("_v")["p"]).alias("seg"),
    )


def unigram_doc_tokens(
    docs: DataFrame,
    seg: DataFrame,
    text_col: str,
    id_col: str,
    max_word_len: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """-> (id_col, *extra_cols, n_words, n_pieces): per-document word
    occurrences and unigram-LM token counts — the corpus' second scan:
    explode words (outer: token-free docs keep a zero row), broadcast-join
    the learned word→n_tokens map (vocabulary-scale), per-doc partial agg
    (the X36 bpe_vocab apply pattern). `extra_cols` ride through the
    explode so report dimensions need no corpus join-back."""
    from ..functions.ngram import word_tokens

    ex = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode_outer(word_tokens(F.col(text_col))).alias("word"),
    ).select(
        id_col, *extra_cols, F.substring("word", 1, max_word_len).alias("w")
    )
    return (
        ex.join(F.broadcast(seg.select("w", "n_tokens")), "w", "left")
        .groupBy(id_col, *extra_cols)
        .agg(
            F.count("n_tokens").alias("n_words"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_pieces"),
        )
    )
