"""X62 — robots-policy filter: the Robots Exclusion Protocol decision
(the original 1994 REP and its standardized form, RFC 9309) applied at
corpus scale — every compliant crawl pipeline must drop pages whose
fetch a site's robots.txt disallows, and re-applying the policy at
PROCESSING time is standard hygiene (policies change between crawl and
use; CC users re-filter).
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Semantics implemented (RFC 9309 §2.2.2): group rules by host; a URL's
verdict comes from the MATCHING rule with the LONGEST path prefix;
at equal length, Allow wins; no matching rule means allowed. This is
the exact prefix subset of the RFC — ``*``/``$`` wildcards (a Google
extension the RFC §2.2.3 folds in) are the production extension point
and would ride the same argmax (match length = expanded-pattern match);
documented, not implemented, because the oracle-checkable prefix core
is what decides the overwhelming majority of real rules.

Spark-first shape: the rules frame is tiny by construction (robots.txt
is per-host and small — RFC 9309 caps parse at 500 KiB), so it
BROADCASTS; the corpus joins on host (no shuffle of the corpus with a
broadcast hash join), each candidate rule is a codegen ``startswith``,
and the winner is one ``max(struct(len, allow, ...))`` aggregation —
the array-argmax discipline (CLAUDE.md: no chained F.when folds).
Everything is string prefix logic, bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def robots_verdicts(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """-> urls + (allowed int, rule_len bigint): the REP longest-match
    verdict per row. ``rules`` = (host, prefix, allow int) — one row per
    Allow/Disallow line. URLs with no matching rule get allowed=1,
    rule_len=0. Duplicate identical rules are harmless (max is
    idempotent); conflicting same-length rules resolve Allow-wins
    (RFC 9309 §2.2.2).

    The verdict groups by ALL of ``urls``' columns, so ``urls`` must be
    row-unique (give each row a doc_id/url key); exact-duplicate input
    rows collapse to one output row — the same contract as SQL
    ``GROUP BY ALL`` dedup."""
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_rh"),
            F.col("prefix").alias("_rp"),
            F.col("allow").cast("int").alias("_ra"),
        )
    )
    j = urls.join(r, urls[host_col] == F.col("_rh"), "left").withColumn(
        "_m",
        F.when(
            F.col("_rp").isNotNull() & F.col(path_col).startswith(F.col("_rp")),
            F.struct(
                F.length("_rp").cast("long").alias("l"),
                F.col("_ra").alias("a"),
            ),
        ),
    )
    grouped = j.groupBy(*urls.columns).agg(F.max("_m").alias("_best"))
    return grouped.select(
        *urls.columns,
        F.coalesce(F.col("_best.a"), F.lit(1)).cast("int").alias("allowed"),
        F.coalesce(F.col("_best.l"), F.lit(0)).cast("long").alias("rule_len"),
    )
