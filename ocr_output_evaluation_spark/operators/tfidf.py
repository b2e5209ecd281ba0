"""X49 — TF-IDF inverted-index cosine similarity: sparse lexical
near-neighbor pairs via a postings self-join, the classic IR shape
(Salton & Buckley 1988 weighting; the "all-pairs similarity search" join
of Bayardo et al. 2007, whose df-based pruning this implements in its
simplest published form). Complements the engine's DENSE similarity
family (X6/X7 embedding cosine, X40 SemDeDup): same cosine geometry,
but over the sparse term space with an inverted index instead of a
brute-force block product — the shape used for lexical near-dup mining
and query-document audit when no embeddings exist.
Reference analog: none — rebuild-only operator.

Exactness: weights are NANO-QUANTIZED integers, so dot products and
norms are exact BIGINT sums — order-independent under any partial-agg
schedule, hence oracle-replayable (the X29/X39 quantize-then-integer-sum
recipe):

    idf_n9 = round(ln(N / df) * 1e9)          (BIGINT, per term)
    wq     = div(tf * idf_n9, 10000)          (~ tf·idf * 1e5)
    dot    = sum(wq_a * wq_b)                  (exact DECIMAL(38,0))
    cosine = dot / (sqrt(ss_a) * sqrt(ss_b))   (IEEE-exact given ints)

Magnitude audit: idf_n9 <= ln(10^12)·1e9 ≈ 2.8e10, and tf·idf_n9 stays
inside BIGINT for any document shorter than ~3·10^8 tokens — fine. The
SQUARES are not BIGINT-safe, though: a spam page repeating a medium-rare
word 10^3 times has wq ≈ 1e9 per such term, and a handful of wq² ≈ 1e18
terms overflows a 64-bit norm accumulator. So dots and norms accumulate
as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — still exact integers,
still order-independent, headroom to ~10^38 — and convert to double
only at the final cosine (an exact-int → binary64 conversion is
round-to-nearest on both engines, hence identical). sqrt is
IEEE-correctly-rounded, identical across engines.

Scale design — the inverted-index discipline:
- the corpus explodes ONCE into (doc, term, tf) and immediately
  collapses through a map-side-combined count; df/idf derive from that
  postings frame (vocabulary-scale agg), never from a second scan.
- the pairing self-join shuffles POSTINGS on the term key; its cost is
  sum_t df_t² — unbounded under Zipf (a stop term with df=10^9 alone
  yields 10^18 candidates). ``max_df`` is the published lever (Bayardo
  §3: highest-df terms carry the least signal and all the cost): terms
  with df > max_df are dropped from the VECTOR SPACE itself (weights,
  norms, and pairs — semantics stay exact cosine over the capped
  vocabulary), bounding candidates by max_df · |postings|, linear in
  the corpus for fixed max_df.
- df = 1 terms can produce no pair, so the pairing leg skips them
  (norms keep them — results unchanged, postings pruned for free).
- norms are a per-doc agg of the same postings frame; the final join of
  the pair frame against the two norm sides is aggregated-by-aggregated.
  Nothing collects; N rides along as a broadcast 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens


def tfidf_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Quantized tf-idf postings: (id_col, term, tf, df, wq) with
    wq = div(tf * round(ln(N/df)*1e9), 10000), an exact BIGINT ~ tf·idf·1e5.

    ``max_df`` drops terms with df > max_df from the vector space (the
    stop-term cost/signal lever — see module docstring). Terms with
    df = N (idf exactly 0) always quantize to wq = 0 and are dropped, so
    every surviving posting has wq >= 1 and doc norms are nonzero.
    """
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    tf = (
        df.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    idf = dfreq.join(F.broadcast(n_docs)).select(
        "term",
        "df",
        F.round(
            F.log(F.col("_n").cast("double") / F.col("df").cast("double")) * 1e9
        )
        .cast("long")
        .alias("_idf_n9"),
    )
    return (
        tf.join(idf, "term")
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.expr("div(tf * _idf_n9, 10000)").alias("wq"),
        )
        .filter(F.col("wq") > 0)
    )


def tfidf_pair_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    top_k: int = 15,
    cache: bool = True,
) -> DataFrame:
    """Top-``top_k`` document pairs by tf-idf cosine over the (optionally
    df-capped) term space. Output: (id_a, id_b, n_shared_terms, dot_q,
    cosine) with id_a < id_b, cosine rounded to 6dp, totally ordered by
    (cosine desc, id_a, id_b).

    The postings frame feeds four plan legs (both pairing sides, both
    norm sides), so it is persisted once by default (the minhash
    signature-frame discipline, operators/dedup.py) — the corpus is
    tokenized once, not four times. ``cache=False`` for one-shot plans;
    persisted frames are never unpersisted here (the result is lazy)."""
    post = tfidf_postings(df, text_col, id_col, max_df=max_df)
    if cache:
        post = post.persist()
    dec = "decimal(38,0)"
    norms = post.groupBy(id_col).agg(
        F.sum(F.col("wq").cast(dec) * F.col("wq").cast(dec)).alias("_ss")
    )
    pairable = post.filter(F.col("df") >= 2).select(id_col, "term", "wq")
    a = pairable.select(
        F.col(id_col).alias("id_a"), "term", F.col("wq").alias("_wa")
    )
    b = pairable.select(
        F.col(id_col).alias("id_b"), "term", F.col("wq").alias("_wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(F.col("_wa").cast(dec) * F.col("_wb").cast(dec)).alias("_dot"),
        )
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_ss").alias("_ssa"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_ss").alias("_ssb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_terms",
            F.col("_dot").cast("double").alias("dot_q"),
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_ssa").cast("double"))
                    * F.sqrt(F.col("_ssb").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "id_a", "id_b")
        .limit(top_k)
    )
