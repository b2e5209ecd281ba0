"""Benchmark harness — prints ONE JSON line with suite + per-query seconds.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), plus the
north-rule extraction throughput (fixture web_pages generated once and
cached under .bench/ — deterministic, no external data).

Modes:
  python bench.py                  # full suite -> one JSON line
  python bench.py --extract-only   # extraction throughput only -> JSON line
  python bench.py --scaling        # same extraction job at local[8] and
                                   # local[32] in separate JVMs; reports
                                   # docs/sec at both + scaling efficiency
                                   # (the sandbox stand-in for the N vs 4N
                                   # executor criterion, SURVEY.md §5.2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_CACHE = os.path.join(REPO, ".bench")

# Headline queries (subset of the full registry: the shuffle/join/window/
# dedup/similarity-heavy ones that represent the engine's hot paths).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "group_moment_stats",
    "top_langs_per_source",
    "events_hourly",
    "running_spend",
    "token_stats",
    "quality_scores",
    "exact_dup_stats",
    "minhash_pairs",
    "embedding_topk",
    "salted_source_stats",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _pages_for(sf: float) -> int:
    # 200k pages/SF: sf0.1 -> 20k fixture pages (html ~1-2 KB each).
    return max(200, int(200_000 * sf))


def ensure_fixture_pages(spark, n_pages: int) -> str:
    path = os.path.join(BENCH_CACHE, f"web_pages_{n_pages}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ocr_output_evaluation_spark.fixtures.generate import web_pages_df

        web_pages_df(spark, n_pages, partitions=32).write.mode("overwrite").parquet(path)
    return path


def run_extraction_bench(spark, n_pages: int) -> dict:
    """Time the full extraction pipeline stage: scan -> prune -> Arrow UDF ->
    flatten -> count+agg (forces full materialization of extracted text)."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.extract.udf import extract_udf

    src = ensure_fixture_pages(spark, n_pages)
    t0 = time.time()
    out = (
        spark.read.parquet(src)
        .select("url", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select("url", "lang", "x.*")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("extracted_text")).alias("chars"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("errors"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    return {
        "n_docs": out["n"],
        "extract_sec": round(wall, 3),
        "docs_per_sec": round(out["n"] / wall, 1),
        "chars_out": out["chars"],
        "errors": out["errors"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, __file__, "--extract-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
        eff = (t32 / t8) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "extraction_scaling",
                    "unit": "docs/sec",
                    "sf": sf,
                    "local8_docs_per_sec": t8,
                    "local32_docs_per_sec": t32,
                    "scaling_efficiency": round(eff, 3),
                    "pass_ge_0.8": eff >= 0.8,
                }
            )
        )
        return

    from ocr_output_evaluation_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = _pages_for(sf)
    if "--extract-only" in sys.argv:
        # Warm the fixture cache (not timed), then one timed run.
        ensure_fixture_pages(spark, n_pages)
        r = run_extraction_bench(spark, n_pages)
        print(
            json.dumps(
                {
                    "metric": "extraction_throughput",
                    "value": r["extract_sec"],
                    "unit": "sec",
                    "sf": sf,
                    "cpus": cpus,
                    **r,
                }
            )
        )
        return

    from ocr_output_evaluation_spark.queries import QUERIES

    timings: dict[str, float] = {}
    # Extraction (the north-rule headline) first.
    ensure_fixture_pages(spark, n_pages)
    ext = run_extraction_bench(spark, n_pages)
    timings["extract"] = ext["extract_sec"]

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "extract_docs_per_sec": ext["docs_per_sec"],
                "extract_n_docs": ext["n_docs"],
            }
        )
    )


if __name__ == "__main__":
    main()
