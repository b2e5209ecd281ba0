"""DSIR-style data selection: importance resampling of a raw corpus toward
a target distribution via hashed n-gram bag-of-words language models.

The published recipe (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169): hash every unigram/bigram of
each document into B buckets, fit smoothed bag-of-words models p (target
corpus) and q (raw corpus) over the bucket vocabulary, score each raw
document by its importance log-weight log w_i = sum_k c_ik (ln p_k - ln q_k)
(c_ik = the doc's count of bucket k), then sample without replacement with
the Gumbel top-k trick: rank by log w_i + g_i and keep the k best.
Reference-repo analog: none (the reference scores OCR confidence, not
training-data selection) — this module extends the training-data operator
surface of SURVEY §2.13.

Spark-first shape, and how it holds at 100 TB:
- both bucket LMs come from ONE corpus pass: explode grams → map-side
  partially-combined count aggregation collapsing to at most B rows
  (bucket totals + target-flagged totals together), so the wire carries a
  bounded frame no matter the corpus size.
- the per-bucket log-ratio table is B rows (default 8192 ≈ the paper's
  bucket count) — broadcast; the scoring pass is explode →
  BroadcastHashJoin → per-doc partial-agg (one fixed-width row per doc on
  the wire), the X13/X21 explode→broadcast idiom. Corpus scanned exactly
  twice (counts pass + scoring pass), the same budget as BPE mining (X36).
- selection is a global top-k (TakeOrderedAndProject): no full sort, the
  k survivors flow to the driver-side of the plan only as a LIMIT.
- determinism end-to-end: log-ratios are rounded to integer "nano-logs"
  (round(r * 1e9) as BIGINT) so each doc's weight is an ORDER-INDEPENDENT
  integer sum (exact under any partial-aggregation order — the
  integer-cents recipe), and the Gumbel noise is a pure md5 function of
  the doc key (u = (hash32 + 0.5) / 2^32, g = -ln(-ln(u))) — no RNG, so
  re-runs and the DuckDB oracle replay bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.ngram import word_ngrams, word_tokens

#: selection-noise salt — versioned so a semantic change re-keys the noise
GUMBEL_SALT = "dsir-sel-v1:"


def _bucket(gram, n_buckets: int):
    # 32-bit md5 prefix → bucket id; DuckDB twin:
    # ('0x' || substr(md5(g), 1, 8))::BIGINT % B  (hex→int recipe)
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def dsir_features(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int = 8192
) -> DataFrame:
    """-> (id_col, _bucket) one row per unigram/bigram OCCURRENCE of the
    normalized text (the paper's hashed-ngram featurization; counts, not
    distinct — bag-of-words models weigh repeated grams). Docs with no
    tokens contribute no rows (callers left-join weights back)."""
    grams = F.concat(
        word_tokens(F.col(text_col)), word_ngrams(F.col(text_col), 2)
    )
    return docs.select(
        F.col(id_col), F.explode(grams).alias("_g")
    ).select(id_col, _bucket(F.col("_g"), n_buckets).alias("_bucket"))


def dsir_log_ratio(
    feats: DataFrame, is_target, n_buckets: int = 8192
) -> DataFrame:
    """-> (_bucket, _r_nano) the B-row integer log-ratio table.

    _r_nano = round((ln p_k - ln q_k) * 1e9) as BIGINT with add-1
    smoothing over the full B-bucket domain: p from the target-flagged
    gram occurrences, q from ALL occurrences (the raw corpus). The full
    domain is materialized (spark.range(B) left join) so unseen buckets
    carry the smoothed floor instead of dropping out. Callers broadcast
    the result (B rows)."""
    counts = feats.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("_raw_n"),
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("_tgt_n"),
    )
    domain = feats.sparkSession.range(n_buckets).select(
        F.col("id").alias("_bucket")
    )
    filled = domain.join(counts, "_bucket", "left").select(
        "_bucket",
        F.coalesce(F.col("_raw_n"), F.lit(0)).alias("_raw_n"),
        F.coalesce(F.col("_tgt_n"), F.lit(0)).alias("_tgt_n"),
    )
    tot = W.partitionBy(F.lit(1))  # B-row frame — a window here is free
    b = F.lit(n_buckets)
    r = F.log((F.col("_tgt_n") + 1.0) / (F.sum("_tgt_n").over(tot) + b)) - F.log(
        (F.col("_raw_n") + 1.0) / (F.sum("_raw_n").over(tot) + b)
    )
    return filled.select(
        "_bucket", F.round(r * 1e9).cast("long").alias("_r_nano")
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target,
    text_col: str,
    id_col: str,
    n_buckets: int = 8192,
) -> DataFrame:
    """-> (id_col, _nano, logw) importance log-weight per document of
    `docs` (every doc keeps a row; token-free docs score 0). `is_target`
    is a boolean Column over `docs` rows marking the target subset whose
    distribution selection should tilt toward. _nano is the exact integer
    sum; logw = _nano / 1e9 its double view."""
    # carry the target flag through the explode (one pass builds both LMs);
    # explode_OUTER keeps token-free docs as a single NULL-bucket row, so the
    # per-doc groupBy below covers EVERY doc and no corpus-scale join-back is
    # needed (a plain explode would drop them and force a docs⋈scores
    # SortMergeJoin — one full extra exchange at 100 TB)
    feats = docs.select(
        F.col(id_col),
        F.when(is_target, True).otherwise(False).alias("_is_t"),
        F.explode_outer(
            F.concat(word_tokens(F.col(text_col)), word_ngrams(F.col(text_col), 2))
        ).alias("_g"),
    ).select(id_col, "_is_t", _bucket(F.col("_g"), n_buckets).alias("_bucket"))
    # NULL-bucket rows fall out of the LM naturally: dsir_log_ratio's domain
    # frame (range(B)) never matches NULL, so totals count only real grams
    lm = dsir_log_ratio(feats, F.col("_is_t"), n_buckets)
    return (
        feats.join(F.broadcast(lm), "_bucket", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("_r_nano"), F.lit(0)).alias("_nano"))
        .select(
            id_col, "_nano", (F.col("_nano") / 1e9).alias("logw")
        )
    )


def gumbel_noise(key, salt: str = GUMBEL_SALT):
    """Deterministic standard-Gumbel noise from an md5 hash of the key:
    u = (hash32 + 0.5) / 2^32 ∈ (0,1), g = -ln(-ln(u)). A pure function of
    the key (no RNG) so runs, resumes, and the DuckDB oracle agree."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    is_target,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = 8192,
) -> DataFrame:
    """Gumbel top-k importance resampling: the k raw documents sampled
    (without replacement) in proportion to their importance weights.

    -> (id_col, _nano, logw, score) where score = logw + Gumbel(key);
    ORDER BY score DESC with the doc key as tiebreak → a global top-k
    (TakeOrderedAndProject — no full sort at any scale)."""
    w = dsir_log_weights(docs, is_target, text_col, id_col, n_buckets)
    scored = w.withColumn(
        "score", F.col("logw") + gumbel_noise(F.col(id_col))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def dsir_log_ratio_list(
    docs: DataFrame,
    is_target,
    text_col: str,
    id_col: str,
    n_buckets: int = 8192,
) -> list[int]:
    """Train the LM pair and collect the bucket-ordered nano-log-ratio
    table as a plain list (length exactly n_buckets — dsir_log_ratio fills
    the whole domain). The driver-side form of the broadcast table, for
    closures and in-row scoring (tiny by construction: B ints)."""
    feats = docs.select(
        F.col(id_col),
        F.when(is_target, True).otherwise(False).alias("_is_t"),
        F.explode(
            F.concat(word_tokens(F.col(text_col)), word_ngrams(F.col(text_col), 2))
        ).alias("_g"),
    ).select(id_col, "_is_t", _bucket(F.col("_g"), n_buckets).alias("_bucket"))
    lm = dsir_log_ratio(feats, F.col("_is_t"), n_buckets)
    return [int(r._r_nano) for r in lm.orderBy("_bucket").collect()]


def with_dsir_logw(
    df: DataFrame,
    r_nano: list[int],
    text_col: str,
    out_col: str = "dsir_logw",
) -> DataFrame:
    """Attach the DSIR importance log-weight as ONE in-row expression — the
    nano-log table rides inside the expression as a literal array, so there
    is no join, no aggregation, and no shuffle. This is the STREAMING form
    (score documents as they arrive — a per-doc groupBy would need state);
    for batch at scale prefer dsir_log_weights' explode → broadcast-join →
    partial-agg shape (codegen beats the interpreted in-row fold — the
    known HOF trap, CLAUDE.md). Both compute the SAME exact integer sum
    (parity pytest-pinned): adds `<out_col>_nano` (BIGINT) and `out_col`
    (= nano / 1e9)."""
    n_buckets = len(r_nano)
    grams = F.concat(word_tokens(F.col(text_col)), word_ngrams(F.col(text_col), 2))
    arr = F.array(*[F.lit(int(x)).cast("long") for x in r_nano])
    nano = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.element_at(arr, (_bucket(g, n_buckets) + F.lit(1)).cast("int")),
    )
    return df.withColumn(f"{out_col}_nano", nano).withColumn(
        out_col, F.col(f"{out_col}_nano") / 1e9
    )
