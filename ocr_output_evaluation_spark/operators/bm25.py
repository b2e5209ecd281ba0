"""BM25 text retrieval scoring (X48) — rank documents against a term
query with the Okapi BM25 function (Robertson & Walker 1994; the
ln(1 + (N-df+0.5)/(df+0.5)) idf form popularized by Lucene).

Reference-repo analog: none (training-data layer, SURVEY §2.13 —
retrieval over the corpus is how training pipelines audit coverage and
mine topic slices).

Spark-first shape, and how it holds at 100 TB:
- NO explode, NO join anywhere: per-term tf and dl are IN-ROW
  expressions over the token array (size of a filtered array), so
  scoring is scan-side and the only exchanges in the whole operator are
  a 1-row stats agg and the final top-k TakeOrderedAndProject.
- pass 1 computes N, total_dl, and per-term document frequencies in ONE
  map-side-combined agg (a 1-row query vector — the sanctioned collect);
  pass 2 embeds them as int literals and scores every doc in-row.
- per-term scores are summed in FIXED WRITTEN ORDER (term list order),
  each term contributing sum(single-element) exactness — no float
  reorder anywhere, so DuckDB replays the doubles bit-for-bit (the lone
  libm call, ln in the idf, differs <= 1 ulp — far below the 6 dp
  report rounding). Every literal is written identically on both sides
  (2.2 stays 2.2, never k1+1 — two float literals that round differently
  from their computed forms).

The per-term in-row HOF filters are interpreted, not codegen (CLAUDE.md
perf note) — acceptable here because they run once per doc over one
array; a hot-path variant would explode→hash-agg tf and pay the doc_id
join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens

K1 = 1.2
B = 0.75


def _tf(tokens, term: str):
    return F.size(F.filter(tokens, lambda x: x == F.lit(term)))


def bm25_scored(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    keep_cols: list[str] = (),
) -> DataFrame:
    """-> (id_col, keep_cols..., dl, n_terms_matched, _bm25 DOUBLE raw).
    Callers round/order/limit; ordering by the ROUNDED score with an
    id tiebreak keeps the top-k total and engine-stable."""
    toks = word_tokens(F.col(text_col))
    base = docs.select(
        id_col,
        *keep_cols,
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("tot"),
        *[
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n, tot = int(stats["n"]), int(stats["tot"])
    # avgdl as the same written division both engines perform
    avgdl = F.lit(tot).cast("double") / F.lit(n).cast("double")
    score = F.lit(0.0)
    for i in range(len(terms)):
        df = int(stats[f"df_{i}"])
        idf = F.log(
            (F.lit(n - df).cast("double") + F.lit(0.5))
            / (F.lit(df).cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"_tf_{i}").cast("double")
        denom = tf + F.lit(K1) * (
            F.lit(0.25) + F.lit(B) * (F.col("dl").cast("double") / avgdl)
        )
        score = score + idf * (tf * F.lit(2.2)) / denom
    matched = None
    for i in range(len(terms)):
        m = F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0)
        matched = m if matched is None else matched + m
    return base.select(
        id_col,
        *keep_cols,
        F.col("dl").cast("long").alias("dl"),
        matched.cast("long").alias("n_terms_matched"),
        score.alias("_bm25"),
    )
