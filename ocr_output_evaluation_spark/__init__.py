"""ocr_output_evaluation_spark — a from-scratch PySpark-native rebuild of the
capabilities of buda-base/ocr-output-evaluation over Common-Crawl-style web pages.

Reference (read-only, studied for WHAT to compute, not HOW):
    /root/reference/  — a pandas + ProcessPoolExecutor batch pipeline that scores
    per-page OCR output (confidence stats + LM perplexity) and runs rollup analytics.

This package re-expresses the same capabilities Spark-first:

- ``extract``    main-content extraction from HTML/PDF bytes — the pandas/Arrow UDF
                 stage (analog of perplexity_scorer.py:44-81 text preprocessing).
- ``functions``  scalar expression helpers (valid() NaN/inf normalizer, text metrics,
                 char-ngram tooling) — all native ``pyspark.sql.functions``.
- ``operators``  relational building blocks: grouped stats, exact percentiles, top-k,
                 histograms, salted aggregation, deterministic sampling, dedup,
                 similarity search.
- ``sources``    readers/writers + the checkpoint/lineage manifest
                 (analog of analyze_confidence.py:75-80 skip-if-exists resume).
- ``plans``      end-to-end pipelines: extraction job, metrics job, analytics layer
                 (analogs of analyze_confidence.py / analyze_by_metadata.py /
                 explore_stats.py entry points).
- ``streaming``  Structured Streaming ingest of the same web_pages schema.
- ``fixtures``   deterministic synthetic data generators (web_pages, reference_lm,
                 token_confidences, dimension tables) — seeded, no external data.
- ``multimodal`` opaque binary payload columns + Arrow-batched decode plumbing.
"""

__version__ = "0.1.0"
