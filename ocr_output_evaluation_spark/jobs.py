"""spark-submit entry points (the north-rule deployment shape).

Cluster:
    zip -r ooe_spark.zip ocr_output_evaluation_spark
    spark-submit --py-files ooe_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        path/to/ocr_output_evaluation_spark/jobs.py extract \
        --source s3://bucket/web_pages --out s3://bucket/run1 \
        --n-buckets 4096

Sandbox (same code path, local master picked by session.get_spark):
    python -m ocr_output_evaluation_spark.jobs extract --source ... --out ...

Subcommands:
    extract   resumable bucketed extraction only
    quality   full EP1 chain: extraction -> doc metrics -> group rollups
    export    training-data export over an extracted table: quality gate ->
              exact dedup -> near-dup cluster collapse -> partitioned write
    ann-index build the materialized ANN index (LSH bucketed table and/or
              IVF cell-partitioned layout) over an embeddings table
    report    render the SVG report artifact set (plans/report.py — the
              visualize.py generate_all_plots analog)
    fixtures  materialize the deterministic synthetic dataset (for dry runs)

Imports in this module are ABSOLUTE (``from ocr_output_evaluation_spark...``),
never relative: spark-submit runs this file as a top-level ``__main__`` script
with no parent package, so relative imports crash at the submit boundary; the
package itself resolves from the ``--py-files`` zip. Pinned end-to-end by
tests/test_spark_submit.py (real subprocess, scrubbed PYTHONPATH).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--n-buckets", type=int, default=32,
                   help="url-hash resume/write buckets (cluster: O(10^3-10^4))")
    p.add_argument("--master", default=None,
                   help="override master (default: local[$SPARK_GRAFT_CPUS]; "
                        "omit under spark-submit to use the cluster master)")
    p.add_argument("--shuffle-partitions", default=None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ooe-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="resumable bucketed extraction")
    ex.add_argument("--source", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--manifest", default=None)
    ex.add_argument("--format", choices=["parquet", "warc"], default="parquet",
                    help="source layout: a web_pages parquet/Iceberg table, "
                         "or raw WARC archives (sources/warc.py)")
    ex.add_argument("--max-buckets", type=int, default=None,
                    help="process at most N pending buckets (checkpoint drill)")
    _add_common(ex)

    q = sub.add_parser("quality", help="extraction + doc metrics + rollups")
    q.add_argument("--source", required=True)
    q.add_argument("--confidences", required=True)
    q.add_argument("--lm", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--group-keys", default="lang,domain",
                   help="comma list of single-key rollups")
    _add_common(q)

    xp = sub.add_parser("export", help="training-data export (dedup + quality)")
    xp.add_argument("--extracted", required=True,
                    help="extracted-documents table (output of `extract`)")
    xp.add_argument("--out", required=True)
    xp.add_argument("--min-quality", type=float, default=0.35)
    xp.add_argument("--jaccard-threshold", type=float, default=0.7)
    xp.add_argument("--text-col", default="extracted_text",
                    help="text column of the input (the extract job emits "
                         "`extracted_text`; raw web_pages tables use `text`)")
    xp.add_argument("--url-col", default="url")
    xp.add_argument("--splits", default="train:80,val:10,test:10",
                    help="name:percent list; percents must sum to 100 "
                         "(cluster-atomic, RNG-free hash assignment)")
    xp.add_argument("--exact-substr-k", type=int, default=None,
                    help="enable X37 span-cleaning: K-token duplicated-span "
                         "removal (keep-one), adds text_clean/es_* columns")
    xp.add_argument("--exact-substr-min-docs", type=int, default=2)
    xp.add_argument("--dsir-target", default=None,
                    help="enable X39 DSIR selection: SQL boolean over the "
                         "input columns marking the target slice (e.g. "
                         "\"lang = 'en'\"); adds dsir_logw")
    xp.add_argument("--dsir-top-k", type=int, default=None,
                    help="with --dsir-target: keep only the Gumbel top-k "
                         "docs by importance weight (deterministic)")
    xp.add_argument("--dsir-buckets", type=int, default=8192)
    xp.add_argument("--split-salt", default="export-split-v1",
                    help="decorrelates independent re-splits of one corpus")
    _add_common(xp)

    sq = sub.add_parser("sql", help="SQL over a table directory (one-shot or REPL)")
    sq.add_argument("--tables", required=True,
                    help="directory of <name>.parquet tables to register as views")
    sq.add_argument("--query", default=None,
                    help="run one query and exit; omit for the interactive loop")
    sq.add_argument("--limit", type=int, default=50, help="display row cap")
    _add_common(sq)

    rp = sub.add_parser("report", help="render the SVG report artifact set")
    rp.add_argument("--sf-dir", required=True,
                    help="table directory (e.g. /root/testdata/sf0.01)")
    rp.add_argument("--out", required=True)
    _add_common(rp)

    ann = sub.add_parser("ann-index", help="build the materialized ANN index")
    ann.add_argument("--embeddings", required=True,
                     help="parquet table with (id, vector) columns")
    ann.add_argument("--vec-col", default="embedding")
    ann.add_argument("--id-col", default="vec_id")
    ann.add_argument("--out", required=True, help="index root directory")
    ann.add_argument("--kind", choices=["lsh", "ivf", "both"], default="both")
    ann.add_argument("--n-planes", type=int, default=12)
    ann.add_argument("--n-cells", type=int, default=256)
    ann.add_argument("--seed", type=int, default=42)
    ann.add_argument("--lsh-buckets", type=int, default=64,
                     help="physical bucket files for the LSH table "
                          "(cluster: O(10^3); probes read ~13/n of them)")
    _add_common(ann)

    gr = sub.add_parser("graph", help="link-graph analytics (PageRank, triangles)")
    gr.add_argument("--edges", required=True,
                    help="parquet edge table (directed; multi-edges honoured)")
    gr.add_argument("--src-col", default="src")
    gr.add_argument("--dst-col", default="dst")
    gr.add_argument("--out", required=True, help="output root directory")
    gr.add_argument("--what", choices=["pagerank", "triangles", "both"],
                    default="both")
    gr.add_argument("--iters", type=int, default=5, help="PageRank iterations")
    _add_common(gr)

    sd = sub.add_parser("snapshot-diff",
                        help="CDC diff of two corpus snapshots (X52)")
    sd.add_argument("--old", required=True, help="parquet snapshot A")
    sd.add_argument("--new", required=True, help="parquet snapshot B")
    sd.add_argument("--key", required=True)
    sd.add_argument("--compare-cols", required=True,
                    help="comma-separated content columns to fingerprint")
    sd.add_argument("--out", required=True,
                    help="output root (diff/ per-key statuses + counts.json line)")
    _add_common(sd)

    zo = sub.add_parser("optimize",
                        help="rewrite a parquet table Z-order-clustered (X57)")
    zo.add_argument("--table", required=True, help="input parquet path")
    zo.add_argument("--cols", required=True,
                    help="two integer columns to interleave, comma-separated")
    zo.add_argument("--out", required=True)
    zo.add_argument("--n-files", type=int, default=16,
                    help="equal-width Morton-key ranges (cluster: O(task count))")
    zo.add_argument("--bits", type=int, default=12,
                    help="per-dimension key resolution")
    _add_common(zo)

    fx = sub.add_parser("fixtures", help="materialize synthetic dataset")
    fx.add_argument("--out", required=True)
    fx.add_argument("--n-pages", type=int, default=10000)
    fx.add_argument("--partitions", type=int, default=32)
    _add_common(fx)

    args = ap.parse_args(argv)

    from ocr_output_evaluation_spark.session import get_spark

    spark = get_spark(
        app_name=f"ooe-spark-{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    if args.cmd == "extract":
        from ocr_output_evaluation_spark.plans.pipeline import run_extraction

        res = run_extraction(
            spark,
            args.source,
            args.out,
            args.manifest or f"{args.out}_manifest",
            n_buckets=args.n_buckets,
            max_buckets=args.max_buckets,
            source_format=args.format,
        )
    elif args.cmd == "quality":
        from ocr_output_evaluation_spark.plans.pipeline import run_quality_pipeline

        res = run_quality_pipeline(
            spark,
            args.source,
            args.confidences,
            args.lm,
            args.out,
            n_buckets=args.n_buckets,
            group_keys=tuple((k,) for k in args.group_keys.split(",") if k),
        )
    elif args.cmd == "export":
        from ocr_output_evaluation_spark.plans.export import run_training_export

        fractions = tuple(
            (name, int(pct))
            for name, pct in (s.split(":") for s in args.splits.split(","))
        )
        res = run_training_export(
            spark,
            args.extracted,
            args.out,
            text_col=args.text_col,
            url_col=args.url_col,
            min_quality=args.min_quality,
            jaccard_threshold=args.jaccard_threshold,
            split_fractions=fractions,
            split_salt=args.split_salt,
            exact_substr_k=args.exact_substr_k,
            exact_substr_min_docs=args.exact_substr_min_docs,
            dsir_target=args.dsir_target,
            dsir_top_k=args.dsir_top_k,
            dsir_buckets=args.dsir_buckets,
        )
    elif args.cmd == "sql":
        from ocr_output_evaluation_spark.sources.io import register_tables_dir, sql_repl

        names = register_tables_dir(spark, args.tables)
        if args.query:
            spark.sql(args.query).show(args.limit, truncate=False)
            res = {"tables": names, "query": args.query}
        else:
            sql_repl(spark, names, limit=args.limit)
            res = {"tables": names}
    elif args.cmd == "report":
        from ocr_output_evaluation_spark.plans.report import generate_all_plots

        res = generate_all_plots(spark, args.sf_dir, args.out)
    elif args.cmd == "ann-index":
        from ocr_output_evaluation_spark.operators.ann_index import build_ivf_index, build_lsh_index

        # no emb.count() here: that would be a full extra corpus scan just
        # for a cosmetic stat — the build itself is the one corpus pass
        emb = spark.read.parquet(args.embeddings)
        res = {"out": args.out, "built": []}
        if args.kind in ("lsh", "both"):
            build_lsh_index(
                spark, emb, args.vec_col, args.id_col,
                name="ooe_ann_lsh", path=f"{args.out}/lsh",
                n_planes=args.n_planes, seed=args.seed, n_buckets=args.lsh_buckets,
            )
            res["built"].append("lsh")
        if args.kind in ("ivf", "both"):
            build_ivf_index(
                spark, emb, args.vec_col, args.id_col, path=f"{args.out}/ivf",
                n_cells=args.n_cells, seed=args.seed,
            )
            res["built"].append("ivf")
    elif args.cmd == "graph":
        from pyspark.sql import functions as F

        edges = spark.read.parquet(args.edges).select(
            F.col(args.src_col).alias("src"), F.col(args.dst_col).alias("dst")
        )
        res = {"out": args.out, "built": []}
        if args.what in ("pagerank", "both"):
            from ocr_output_evaluation_spark.operators.pagerank import pagerank

            # node set = every endpoint (dangling hash targets included)
            nodes = (
                edges.select(F.col("src").alias("node"))
                .unionAll(edges.select(F.col("dst").alias("node")))
                .distinct()
            )
            pagerank(nodes, edges, n_iters=args.iters).write.mode(
                "overwrite"
            ).parquet(f"{args.out}/pagerank")
            res["built"].append("pagerank")
        if args.what in ("triangles", "both"):
            from ocr_output_evaluation_spark.operators.triangles import (
                node_triangle_counts,
            )

            node_triangle_counts(edges).write.mode("overwrite").parquet(
                f"{args.out}/triangles"
            )
            res["built"].append("triangles")
    elif args.cmd == "optimize":
        from ocr_output_evaluation_spark.sources.zorder import cluster_by_zorder

        c1, c2 = [c for c in args.cols.split(",") if c][:2]
        cluster_by_zorder(
            spark.read.parquet(args.table), c1, c2, args.out,
            n_files=args.n_files, bits=args.bits,
        )
        res = {"out": args.out, "cols": [c1, c2], "n_files": args.n_files}
    elif args.cmd == "snapshot-diff":
        from pyspark.sql import functions as F

        from ocr_output_evaluation_spark.operators.diff import snapshot_diff

        a = spark.read.parquet(args.old)
        b = spark.read.parquet(args.new)
        cols = [c for c in args.compare_cols.split(",") if c]
        d = snapshot_diff(a, b, args.key, cols)
        d.write.mode("overwrite").parquet(f"{args.out}/diff")
        counts = {
            r["status"]: r["n"]
            for r in spark.read.parquet(f"{args.out}/diff")
            .groupBy("status")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
        res = {"out": args.out, "counts": counts}
    else:
        from ocr_output_evaluation_spark.fixtures.generate import write_fixture_set

        write_fixture_set(spark, args.out, args.n_pages, args.partitions)
        res = {"out": args.out, "n_pages": args.n_pages}

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
