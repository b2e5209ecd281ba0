"""X64 — winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003, SIGMOD — the MOSS local fingerprinting algorithm): slide a window
of w consecutive k-gram hashes over each document and select each
window's MINIMUM hash (rightmost occurrence on ties); the selected set
is the document's fingerprint sketch. The paper's guarantee (§3,
"correctness"): any substring match of length >= w + k - 1 tokens
between two documents is caught by at least one SHARED fingerprint —
a local, position-aware sketch that detects partial overlap/containment
(plagiarism, quote reuse, boilerplate spans) where MinHash (X2) only
estimates whole-document resemblance and ExactSubstr (X37) needs the
full window census. Density: expected 2/(w+1) of k-grams selected.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- k-gram hashes are built IN-ROW (the X37 transform: slice -> join ->
  md5 — measured fastest no-shuffle form; rolling-hash folds are 4-7x
  slower interpreted), truncated to 40 bits and packed with the
  position into ONE BIGINT: comb = h40 * 2^20 + (2^20 - 1 - s), so an
  ordinary MIN is "min hash, rightmost on ties" — the cross-engine
  pack-the-tiebreak-into-one-integer discipline (X55 orientation).
- window minima are one window function over the exploded k-gram frame
  (partitionBy doc, orderBy position, ROWS current..w-1 following):
  exactly ONE corpus exchange, on doc id — the text itself never
  shuffles, only (id, 8-byte comb) rows.
- the distinct selected set and all downstream joins are
  FINGERPRINT-scale (expected 2/(w+1) density), and cross-doc matching
  joins on the fingerprint value with an X2-style degenerate-guard
  (fingerprints in > max_df docs are boilerplate and excluded), so no
  bucket can go quadratic.
- positions are capped at 2^20 - 1: documents with >= 2^20 k-grams
  (~1M tokens) would wrap the pack, so they are EXCLUDED from the
  sketch entirely (the explode guard) rather than fingerprinted
  wrongly — the documented contract is "chunk long docs first (X63)";
  the DuckDB oracle mirrors the same exclusion predicate.
- the per-window dedupe reuses the window's hashpartitioning(id):
  groupBy(id).collect_set(comb) -> explode, instead of a distinct()
  that would shuffle (id, pos, fp) a second time — the whole operator
  is ONE exchange (plan-pinned). Per-doc set size is bounded by the
  k-gram count, itself < 2^20 by the guard.
- production swaps the md5-derived h40 for xxhash64 (the
  minhash_pairs_md5 twin pattern); md5 is the DuckDB-replayable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.ngram import word_tokens

__all__ = ["winnow_fingerprints", "winnow_matches"]

_POS_BITS = 20
_POS_CAP = 1 << _POS_BITS  # packed-position domain; docs must have < 2^20 k-grams


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """-> (id_col, pos, fp): the winnowing fingerprint set — for every
    window of ``w`` consecutive k-gram hashes, the minimum 40-bit hash
    (rightmost occurrence on ties), deduplicated. ``pos`` is the 0-based
    token position of the selected k-gram; ``fp`` its 40-bit hash.
    Documents with fewer than k tokens contribute nothing; documents
    with 1..w-1 k-grams yield the global minimum (one truncated window —
    the standard short-document extension).

    ``hash_family``: "md5" (default) is the DuckDB-replayable oracle form;
    "xxhash64" is the production twin (pmod to 40 bits — integer-only,
    no hex-string round trip, same pack/min/unpack pipeline; Spark-only,
    so rows-only checked — the minhash_pairs/minhash_pairs_md5 split)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    toks = word_tokens(F.col(text_col))
    n_k = F.size(toks) - F.lit(k - 1)

    def _h40(gram):
        if hash_family == "md5":
            return F.conv(F.substring(F.md5(gram), 1, 10), 16, 10).cast("long")
        return F.pmod(F.xxhash64(gram), F.lit(1 << 40))

    combs = F.transform(
        F.sequence(F.lit(0), n_k - F.lit(1)),
        lambda i: (
            _h40(F.array_join(F.slice(toks, i + 1, k), " "))
            * F.lit(_POS_CAP)
            + (F.lit(_POS_CAP - 1) - i)
        ),
    )
    kg = df.select(
        F.col(id_col),
        (n_k.cast("long")).alias("_nk"),
        F.posexplode(F.when((n_k >= 1) & (n_k < _POS_CAP), combs)).alias(
            "_s", "_comb"
        ),
    )
    win = Window.partitionBy(id_col).orderBy("_s").rowsBetween(0, w - 1)
    picks = kg.select(
        F.col(id_col),
        F.col("_s"),
        F.col("_nk"),
        F.min("_comb").over(win).alias("_m"),
    ).filter(F.col("_s") <= F.greatest(F.col("_nk") - w, F.lit(0)))
    # dedupe per doc WITHOUT a second exchange: groupBy(id) matches the
    # window's hashpartitioning(id), so collect_set -> explode plans with
    # zero additional shuffles (a distinct() on (id, pos, fp) would not).
    return (
        picks.groupBy(id_col)
        .agg(F.collect_set("_m").alias("_ms"))
        .select(F.col(id_col), F.explode("_ms").alias("_m"))
        .select(
            F.col(id_col),
            (F.lit(_POS_CAP - 1) - F.pmod("_m", F.lit(_POS_CAP)))
            .cast("long")
            .alias("pos"),
            F.expr(f"div(_m, {_POS_CAP})").cast("long").alias("fp"),
        )
    )


def winnow_matches(
    fps: DataFrame,
    id_col: str,
    max_df: int = 16,
    cache: bool = True,
    pre_deduped: bool = False,
) -> DataFrame:
    """-> (id_a, id_b, n_shared): document pairs ranked by the number of
    DISTINCT shared fingerprint values (positions ignored — the MOSS
    match count). Fingerprints occurring in more than ``max_df``
    documents are boilerplate and excluded (the X2 degenerate-bucket
    guard: a corpus-wide header would otherwise pair everything with
    everything). ``cache`` persists the distinct value frame, which
    feeds THREE plan branches (doc-frequency census + both self-join
    sides) — without it the upstream fingerprint pipeline runs three
    times (the minhash signature-frame contract; never unpersisted
    here). ``pre_deduped=True`` declares ``fps`` already IS a distinct
    (id, fp) value frame (callers that also need per-doc sketch sizes
    build it once, persist it, and share it — one dedupe total)."""
    vals = fps.select(F.col(id_col), "fp")
    if not pre_deduped:
        vals = vals.distinct()
        if cache:
            vals = vals.persist()
    docfreq = vals.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    keep = docfreq.filter(F.col("_df") <= max_df).select("fp")
    v = vals.join(keep, "fp")
    a = v.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = v.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
