"""X72 — DoReMi domain reweighting: Group-DRO multiplicative-weights
mixture optimization (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
Speeds Up Language Model Pretraining", NeurIPS). A small proxy model is
trained with Group DRO against a frozen reference model; at each step the
per-domain EXCESS loss (proxy loss minus reference loss, clipped at 0)
drives an exponentiated-gradient update of the domain weights, which are
then smoothed toward uniform; the published output is the TIME-AVERAGE of
the per-step weights, used to reweight the pretraining mixture. This
module replays that update rule exactly over deterministic per-domain
excess losses computed from the engine's char-ngram LM layer (X13): the
"proxy" and "reference" models are two train_char_lm frames, and the
per-domain loss under each is the exact nano-integer cross-entropy sum
the X69 Moore-Lewis path established.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- the merged per-gram loss table (full-outer over the two LM vocabs,
  each side backed off to OOV_LOGP, both nano-quantized BIGINT) is
  VOCABULARY-scale and broadcasts; scoring is ONE corpus pass:
  explode -> BroadcastHashJoin -> map-side-combined per-DOMAIN agg. The
  corpus never shuffles — the only exchange carries one fixed-width row
  per domain.
- the multiplicative-weights loop runs entirely on the DOMAIN-scale
  frame (tens of rows for any corpus): ``n_steps`` fixed-unroll selects
  with empty-frame window sums. The single-partition window is by
  construction over a tiny frame and never touches the corpus.
- every cross-row reduction in the loop sums NANO-QUANTIZED BIGINTs
  (weights and step-multipliers are re-quantized to 1e-9 after each
  elementwise double op), so results are exact integers independent of
  partial-aggregation order and replayable by the DuckDB oracle on
  operand-identical doubles. ``exp`` is applied to an exact-integer-
  derived operand and immediately re-quantized, the engine-wide ln/log10
  parity discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.ngram import char_ngrams, normalize_for_scoring
from .perplexity import NGRAM_N, OOV_LOGP

__all__ = ["merged_loss_table", "domain_excess_losses", "doremi_weights"]

OOV_NANO = int(round(-OOV_LOGP * 1e9))  # 6_000_000_000


def merged_loss_table(lm_proxy: DataFrame, lm_ref: DataFrame) -> DataFrame:
    """-> (lang, ngram, _pn BIGINT, _rn BIGINT): per-gram nano-quantized
    NEGATIVE log10 probability under the proxy and reference LMs
    (pn = round(-logp_proxy * 1e9)), each side backed off to OOV_LOGP
    where the gram is unseen (full-outer over the two vocabs). Rows where
    BOTH sides equal the OOV constant cannot exist (the gram is in at
    least one vocab), so a scoring-join MISS coalescing to
    (OOV_NANO, OOV_NANO) is exact. Vocab-scale — broadcast it."""
    p = lm_proxy.select("lang", "ngram", F.col("logp").alias("_lp"))
    # fresh exprIds on one side: both LMs usually derive from the SAME
    # scan, and a shared-lineage join after window aggregation trips
    # [INTERNAL_ERROR] conflicting references (CLAUDE.md; qdigest fix)
    r = lm_ref.select("lang", "ngram", F.col("logp").alias("_lr"))
    r = r.toDF(*r.columns)
    d = p.join(r, ["lang", "ngram"], "full_outer")
    oov = F.lit(OOV_LOGP)
    pn = F.round(-F.coalesce(F.col("_lp"), oov) * F.lit(1e9)).cast("long")
    rn = F.round(-F.coalesce(F.col("_lr"), oov) * F.lit(1e9)).cast("long")
    return d.select("lang", "ngram", pn.alias("_pn"), rn.alias("_rn"))


def domain_excess_losses(
    docs: DataFrame,
    lm_proxy: DataFrame,
    lm_ref: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """-> (domain, n_grams, proxy_nano, ref_nano, excess): per-domain
    exact BIGINT cross-entropy numerators under both models and the
    Group-DRO excess loss excess = max(0, (proxy_nano - ref_nano) /
    (1e9 * n_grams)) in log10 units per gram, quantized to 9dp. One
    corpus pass; the corpus never shuffles (domain-keyed map-side
    combine). Domains with no scoreable grams are dropped (they carry no
    gradient signal and the paper's per-domain loss is undefined)."""
    tbl = merged_loss_table(lm_proxy, lm_ref)
    tbl = tbl.toDF(*tbl.columns)  # docs shares the LMs' scan lineage too
    norm = F.coalesce(normalize_for_scoring(F.col(text_col)), F.lit(""))
    grams = docs.select(
        F.col(domain_col).alias("domain"),
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(norm, NGRAM_N)).alias("ngram"),
    )
    oov = F.lit(OOV_NANO)
    agg = (
        grams.join(F.broadcast(tbl), ["lang", "ngram"], "left")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_pn"), oov)).cast("long").alias("proxy_nano"),
            F.sum(F.coalesce(F.col("_rn"), oov)).cast("long").alias("ref_nano"),
        )
    )
    excess = F.round(
        F.greatest(F.lit(0.0), (F.col("proxy_nano") - F.col("ref_nano"))
                   .cast("double")
                   / (F.col("n_grams").cast("double") * F.lit(1e9))),
        9,
    )
    return agg.select(
        "domain", "n_grams", "proxy_nano", "ref_nano", excess.alias("excess")
    )


def doremi_weights(
    losses: DataFrame,
    n_steps: int = 5,
    eta: float = 1.0,
    smoothing: float = 0.01,
) -> DataFrame:
    """-> (domain, n_grams, excess, w_final, w_avg): the DoReMi
    multiplicative-weights trajectory over a frame of per-domain excess
    losses (domain, n_grams, excess, ...), fixed-unrolled ``n_steps``
    times from the uniform start:

        raw_t(d)   = w_{t-1}(d) * exp(eta * excess(d))
        w_t(d)     = (1 - smoothing) * raw_t(d) / sum(raw_t) + smoothing/k

    (Xie et al. 2023, Algorithm 1 with a static excess-loss vector — no
    proxy retraining between steps, so the update rule itself is what is
    replayed). ``w_final`` is the last step's weight, ``w_avg`` the
    paper's time-average over steps 1..n_steps, both rounded to 6dp.

    Integer discipline: weights live as nano-quantized BIGINTs between
    steps, the step multiplier exp(eta*excess) is itself nano-quantized,
    and every cross-row sum (the normalizer, the step accumulator) sums
    BIGINTs — exact under any row order, so the single-partition window
    over this DOMAIN-scale frame is deterministic and DuckDB-replayable.
    ``n_steps`` must be >= 1 (fixed-unroll contract)."""
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    w = Window.partitionBy()  # domain-scale frame: single partition is fine
    k = F.count(F.lit(1)).over(w).cast("double")
    mult_n = F.round(F.exp(F.lit(eta) * F.col("excess")) * F.lit(1e9)).cast(
        "long"
    )
    cur = losses.select(
        "domain",
        "n_grams",
        "excess",
        mult_n.alias("_mn"),
        F.round(F.lit(1e9) / k).cast("long").alias("_wn"),
        F.lit(0).cast("long").alias("_acc"),
    )
    for _ in range(n_steps):
        raw_n = F.round(
            (F.col("_wn").cast("double") / F.lit(1e9))
            * (F.col("_mn").cast("double") / F.lit(1e9))
            * F.lit(1e9)
        ).cast("long")
        cur = cur.select(
            "domain", "n_grams", "excess", "_mn", "_acc", raw_n.alias("_raw")
        )
        s = F.sum("_raw").over(w).cast("double")
        step = (
            F.lit(1.0 - smoothing) * (F.col("_raw").cast("double") / s)
            + F.lit(smoothing) / k
        )
        cur = cur.select(
            "domain",
            "n_grams",
            "excess",
            "_mn",
            F.round(step * F.lit(1e9)).cast("long").alias("_wn"),
            "_acc",
        )
        cur = cur.select(
            "domain",
            "n_grams",
            "excess",
            "_mn",
            "_wn",
            (F.col("_acc") + F.col("_wn")).alias("_acc"),
        )
    w_final = F.round(F.col("_wn").cast("double") / F.lit(1e9), 6)
    w_avg = F.round(
        F.col("_acc").cast("double") / (F.lit(1e9) * F.lit(float(n_steps))), 6
    )
    return cur.select(
        "domain",
        "n_grams",
        "excess",
        w_final.alias("w_final"),
        w_avg.alias("w_avg"),
    )
