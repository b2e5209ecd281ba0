"""Exact-substring (duplicated-span) deduplication — the corpus-vs-corpus
verbatim-span removal mode of Lee et al. 2022 (arXiv:2107.06499,
"Deduplicating Training Data Makes Language Models Better", ExactSubstr):
token spans that appear verbatim in more than one document are cut out of
the documents, with the remainders rejoined in order.

Reference-repo analog: none (training-data layer, SURVEY §2.13). Bounded,
oracle-able form of the suffix-array algorithm: fixed-length K-token window
fingerprints at stride 1 stand in for arbitrary-length duplicated substrings
— a span is removed iff it is covered by some droppable K-window whose
fingerprint occurs in >= min_docs distinct documents. Both published modes
ship: the default removes every copy (the safe direction for
decontamination-style cleaning, the same all-copies contract as line-level
dedup X24 — within-document repetition stays the business of repetition
signals X22); ``keep_first=True`` exempts each fingerprint's canonical
(lexicographically first (doc, start)) occurrence, Lee et al.'s
keep-one-copy semantics.

Spark-first shape, and how it holds at 100 TB:
- window fingerprints are built IN-ROW (transform over the token array:
  slice -> join -> md5) — the document text itself never leaves its
  partition; only 16-byte fingerprints hit the wire.
- the duplicate census is ONE hash aggregation over (fp, doc) with
  map-side-combining countDistinct — the same count shape as X24's line
  census, with fixed-width keys.
- the duplicated tail (fp with >= min_docs docs) is small by the same
  heavy-tail argument as X24's banned set; it broadcasts, and the
  corpus-side membership probe is a BroadcastHashJoin — the corpus never
  shuffles for membership.
- the per-doc duplicated-window-start lists (the only doc-keyed frame
  that joins back) are occurrence-scale, i.e. proportional to the
  duplicated fraction of the corpus (~3-6% of windows in Lee et al.'s
  measurements), broadcast back like X26's quota frame; the span drop is
  one in-row filter over token positions.
- production swaps md5 for xxhash64 (8-byte keys); md5 is the
  DuckDB-replayable twin, the minhash_pairs_md5 pattern.

Measured (r4, 10x/100x spot fixtures): exactly linear in corpus size —
the constant per-doc cost is the interpreted transform itself, NOT the
md5 (dropping md5 changed nothing: 7.97 s vs 8.13 s at 10x), and the
"obvious" rewrite to per-window rolling-hash arithmetic folds (nested
F.aggregate over precomputed token hashes) measured 4-7x SLOWER
(33-60 s) — interpreted fold steps cost more than slice+join+md5.
The shipped shape is the fastest known no-shuffle form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens

__all__ = ["duplicated_window_starts", "exact_substr_dedup"]


def _windows(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """-> (id_col, _s, _fp): every K-token window's 0-based start position
    and md5 fingerprint of its space-joined tokens. Docs with < k tokens
    contribute nothing."""
    toks = word_tokens(F.col(text_col))
    n_win = F.size(toks) - F.lit(k - 1)
    fps = F.transform(
        F.sequence(F.lit(0), n_win - F.lit(1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i + F.lit(1), k), " ")),
    )
    return df.select(
        F.col(id_col), F.posexplode(F.when(n_win >= 1, fps)).alias("_s", "_fp")
    )


def duplicated_window_starts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """-> (id_col, _starts): for every document containing at least one
    droppable duplicated window, the sorted 0-based start positions of its
    droppable duplicated windows. A window is duplicated iff its
    fingerprint occurs in >= min_docs DISTINCT documents corpus-wide.

    keep_first=False drops every occurrence (the all-copies contract);
    keep_first=True exempts each fingerprint's CANONICAL occurrence — the
    lexicographically smallest (doc_id, start) — matching Lee et al.'s
    keep-one-copy semantics. The canonical frame is one row per duplicated
    fingerprint (same scale as the dup tail) and broadcasts; a canonical
    span can still lose tokens to an overlapping non-canonical occurrence
    of a DIFFERENT fingerprint in the same document."""
    wins = _windows(df, text_col, id_col, k)
    dup = (
        wins.groupBy("_fp")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_fp")
    )
    occ = wins.join(F.broadcast(dup), "_fp")
    if keep_first:
        canon = occ.groupBy("_fp").agg(
            F.min(F.struct(F.col(id_col), F.col("_s"))).alias("_c")
        )
        occ = (
            occ.join(F.broadcast(canon), "_fp")
            .filter(
                ~(
                    (F.col(id_col) == F.col(f"_c.{id_col}"))
                    & (F.col("_s") == F.col("_c._s"))
                )
            )
            .drop("_c")
        )
    return occ.groupBy(id_col).agg(
        F.array_sort(F.collect_list("_s")).alias("_starts")
    )


def exact_substr_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_docs: int = 2,
    keep_cols: tuple[str, ...] = (),
    keep_first: bool = False,
) -> DataFrame:
    """-> (id_col, *keep_cols, text_dedup, n_tokens, n_dropped): each
    document with all tokens covered by any droppable duplicated K-window
    removed (every copy by default; the fingerprint's canonical occurrence
    survives with keep_first=True — Lee et al.'s keep-one mode), remainder
    rejoined space-separated in original order. n_tokens counts the doc's
    normalized tokens; n_dropped how many were cut (0 for untouched docs;
    both 0 for token-less docs, whose text_dedup is '' like their
    normalized form). keep_cols pass through in-row so callers don't
    re-join the corpus."""
    starts = duplicated_window_starts(df, text_col, id_col, k, min_docs, keep_first)
    toks = word_tokens(F.col(text_col))
    st = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    kept = F.filter(
        toks,
        lambda x, p: ~F.exists(
            st, lambda s: (s <= p) & (p <= s + F.lit(k - 1))
        ),
    )
    return (
        df.join(F.broadcast(starts), id_col, "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.array_join(kept, " ").alias("text_dedup"),
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_dropped"),
        )
    )
