"""X66 — weighted blocklist term tagging: the published badword/blocklist
filter family — C4 removed any page containing a term from the public
"Dirty, Naughty, Obscene, and Otherwise Bad Words" list (Raffel et al.
2020 §2.2); RefinedWeb/FineWeb soften the same idea into weighted URL +
term scores with a threshold (Penedo et al. 2023 §3.1). This operator is
the weighted form: per-document hit counts and a weighted score against a
small (term, weight) list, flagged at a threshold — the hard C4 behavior
is weight=threshold on every term.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- the blocklist is TINY BY CONSTRUCTION (curated lists are a few thousand
  rows) and broadcasts; the corpus never shuffles for membership — the
  X21/X24 discipline.
- tokens explode in-row (word_tokens) and LEFT-join the broadcast list;
  the per-doc groupBy is map-side combined, so the only exchange carries
  ~one row per document, never per token (explode_outer + broadcast-left
  + coalesce keeps zero-hit docs without a corpus-scale join-back — the
  proven X39 recipe).
- integer weights keep scores exact under any partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens

__all__ = ["blocklist_tag"]


def blocklist_tag(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: DataFrame,
    threshold: int = 8,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """-> (id_col, *keep_cols, n_hits, n_terms, score, flagged): per-document
    blocklist tally. ``terms`` is a (term STRING, weight BIGINT) frame —
    small by contract, broadcast. n_hits counts token occurrences matching
    any term, n_terms the DISTINCT terms hit, score the weight-sum;
    flagged = 1 at score >= threshold. Documents with no tokens or no hits
    survive with zeros."""
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(word_tokens(F.col(text_col))).alias("_tok"),
    )
    tl = F.broadcast(
        terms.select(F.col("term").alias("_tok"), F.col("weight").alias("_w"))
    )
    j = toks.join(tl, "_tok", "left")
    hit = F.col("_w").isNotNull()
    return (
        j.groupBy(id_col, *keep_cols)
        .agg(
            F.sum(hit.cast("long")).cast("long").alias("n_hits"),
            F.countDistinct(F.when(hit, F.col("_tok"))).cast("long").alias("n_terms"),
            F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("score"),
        )
        .withColumn("flagged", (F.col("score") >= threshold).cast("long"))
    )
