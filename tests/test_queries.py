"""Regression gate for the driver-contract registry: every queries() entry
runs, and every oracle_sql() entry matches its Spark twin value-for-value on
DuckDB at sf0.001 (the full sf0.01 sweep is tools/check_oracle.py — this is
the fast always-on version of the same comparison).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.queries import ORACLES, QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif dt.startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
        elif dt == "object":
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _assert_frames_match(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column names differ"
    assert len(sdf) == len(odf), f"{name}: row counts differ ({len(sdf)} vs {len(odf)})"
    a, b = _normalize(sdf.copy()), _normalize(odf.copy())
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].astype(a[c].dtype).tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            else:
                ok = (pd.isna(x) and pd.isna(y)) or x == y
            assert ok, f"{name}.{c} row {i}: spark={x!r} oracle={y!r}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    _assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_execute(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


# ---------------------------------------------------------------------------
# Unit tests for the signature operators (previously untested: passing a
# lambda Column as a shift amount fails only at expression-build time).
# ---------------------------------------------------------------------------
def test_simhash_deterministic_and_similarity_ordered(spark):
    from ocr_output_evaluation_spark.operators.dedup import simhash64

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words entirely unrelated text here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.sig for r in df.select("id", simhash64(F.col("text")).alias("sig")).collect()}
    assert out[4] is None
    assert out[1] is not None
    # re-run -> identical signatures (deterministic)
    out2 = {r.id: r.sig for r in df.select("id", simhash64(F.col("text")).alias("sig")).collect()}
    assert out == out2
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")  # noqa: E731
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_hyperplane_signature_buckets_similar_vectors(spark):
    from ocr_output_evaluation_spark.operators.similarity import hyperplane_signature

    rows = [
        (1, [1.0, 0.0, 0.0, 0.2]),
        (2, [0.99, 0.01, 0.0, 0.21]),   # nearly identical to 1
        (3, [-1.0, 0.5, 0.3, -0.2]),    # far away
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    sig = hyperplane_signature(F.col("v"), n_planes=12, seed=7)
    out = {r.id: r.s for r in df.select("id", sig.alias("s")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert all(0 <= s < 2**12 for s in out.values())


def test_brute_force_top_k_np_matches_expression_form(spark, sf_dir):
    from ocr_output_evaluation_spark.operators.similarity import (
        brute_force_top_k,
        brute_force_top_k_np,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in e.filter(F.col("vec_id") == 3).collect()[0].embedding]
    a = brute_force_top_k(e, "embedding", "vec_id", query, k=15).collect()
    b = brute_force_top_k_np(e, "embedding", "vec_id", query, k=15).collect()
    assert [r.vec_id for r in a] == [r.vec_id for r in b]
    for ra, rb in zip(a, b):
        assert abs(ra.cosine - rb.cosine) < 1e-9


def test_simhash_signatures_match_expression_form(spark):
    from ocr_output_evaluation_spark.operators.dedup import (
        simhash64,
        simhash_signatures,
    )

    rows = [(i, f"doc {i} shares words with doc {i+1} and so on") for i in range(30)]
    rows.append((99, "   "))  # whitespace-only -> no tokens -> no signature
    df = spark.createDataFrame(rows, "id long, text string")
    agg = {r._id: r._sig for r in simhash_signatures(df, "text", "id").collect()}
    expr = {
        r.id: r.sig
        for r in df.select("id", simhash64(F.col("text")).alias("sig")).collect()
    }
    assert 99 not in agg and expr[99] is None
    for k, v in agg.items():
        assert expr[k] == v, f"doc {k}: agg path != expression path"


def test_minhash_signatures_match_expression_form(spark):
    from ocr_output_evaluation_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
    )

    rows = [(i, f"document number {i} with some shared boilerplate text") for i in range(20)]
    rows.append((99, "xy"))  # shorter than the shingle -> no signature
    df = spark.createDataFrame(rows, "id long, text string")
    agg_sigs = {
        r._id: list(r._sig)
        for r in minhash_signatures(df, "text", "id", n_hashes=16, shingle_n=5).collect()
    }
    expr_sigs = {
        r.id: (None if r.sig is None else list(r.sig))
        for r in df.select(
            "id", minhash_signature(F.col("text"), 16, 5).alias("sig")
        ).collect()
    }
    assert 99 not in agg_sigs and expr_sigs[99] is None
    for k, v in agg_sigs.items():
        assert expr_sigs[k] == v, f"doc {k}: agg path != expression path"


def test_pairwise_top_k_np_matches_local_numpy(spark):
    """Exact all-pairs top-k: the distributed block-matmul result must equal
    a single-process numpy brute force — no pair may be lost across block
    boundaries, and NULL / wrong-dim / zero vectors must drop out."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.similarity import pairwise_top_k_np

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).tolist() for i in range(40)}
    vecs[40] = None           # NULL embedding
    vecs[41] = [0.0] * 8      # zero norm
    vecs[42] = [1.0, 2.0]     # wrong dimension
    rows = [(i, v) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    got = pairwise_top_k_np(df, "v", "id", k=30, n_blocks=3).collect()

    good = {i: np.asarray(v) for i, v in vecs.items() if v is not None and len(v) == 8 and any(v)}
    exp = []
    for a in sorted(good):
        for b in sorted(good):
            if a < b:
                va, vb = good[a], good[b]
                exp.append((a, b, float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))))
    exp.sort(key=lambda t: (-t[2], t[0], t[1]))
    exp = exp[:30]

    assert [(r.id_a, r.id_b) for r in got] == [(a, b) for a, b, _ in exp]
    for r, (_, _, c) in zip(got, exp):
        assert abs(r.cosine - c) < 1e-9
    dropped = {40, 41, 42}
    assert not dropped & {r.id_a for r in got} | dropped & {r.id_b for r in got}


def test_pairwise_top_k_single_block_and_k_larger_than_pairs(spark):
    from ocr_output_evaluation_spark.operators.similarity import pairwise_top_k_np

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = pairwise_top_k_np(df, "v", "id", k=100, n_blocks=1).collect()
    assert len(got) == 3  # all C(3,2) pairs, k larger than pair count
    assert (got[0].id_a, got[0].id_b) == (1, 2)  # most similar first


def test_pairwise_top_k_exact_tiebreak_at_argpartition_cut(spark):
    """r3: local top-k is argpartition + survivor-only lexsort. Identical
    vectors make EVERY pairwise cosine tie at 1.0, so with k < n_pairs the
    partition cut lands inside one tie plateau — the result must be ordered
    purely by (id_a, id_b) with no pair skipped (ties at the cut must
    survive into the lexsort before truncation)."""
    from ocr_output_evaluation_spark.operators.similarity import pairwise_top_k_np

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(8)]  # C(8,2)=28 pairs, all cos=1
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = pairwise_top_k_np(df, "v", "id", k=10, n_blocks=2).collect()
    exp = sorted((a, b) for a in range(8) for b in range(a + 1, 8))[:10]
    assert [(r.id_a, r.id_b) for r in got] == exp
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in got)


def test_embedding_near_dup_pairs_recall_on_planted_clusters(spark):
    """Hyperplane-bucketed near-dup: planted duplicate clusters (cosine ~1)
    must all surface; orthogonal decoys must not. Truth set computed by the
    exact pairwise operator on the same input."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.dedup import embedding_near_dup_pairs
    from ocr_output_evaluation_spark.operators.similarity import pairwise_top_k_np

    rng = np.random.RandomState(11)
    rows = []
    next_id = 0
    for _ in range(5):  # 5 clusters of 3 near-identical vectors
        base = rng.randn(16)
        for _ in range(3):
            rows.append((next_id, (base + rng.randn(16) * 1e-3).tolist()))
            next_id += 1
    for _ in range(20):  # decoys
        rows.append((next_id, rng.randn(16).tolist()))
        next_id += 1
    df = spark.createDataFrame(rows, "id long, v array<double>")

    got = embedding_near_dup_pairs(df, "v", "id", threshold=0.999, n_planes=8, seed=3)
    got_pairs = {(r.id_a, r.id_b) for r in got.collect()}

    exact = pairwise_top_k_np(df, "v", "id", k=1000, n_blocks=2)
    truth = {(r.id_a, r.id_b) for r in exact.collect() if r.cosine >= 0.999}

    assert len(truth) == 15  # C(3,2) per cluster * 5
    assert got_pairs == truth  # recall 1.0 on same-direction dups, no false positives


def test_connected_components_chain_islands_singletons(spark):
    from ocr_output_evaluation_spark.operators.components import (
        component_sizes,
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    # chain 0-1-2-3, triangle 4-5-6 (+redundant edge), 7/8/9 isolated
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)], "id_a long, id_b long"
    )
    comp = connected_components(nodes, edges)
    got = {r.id: r.component for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7, 8: 8, 9: 9}
    sizes = {r.component: r.n_docs for r in component_sizes(comp).collect()}
    assert sizes == {0: 4, 4: 3, 7: 1, 8: 1, 9: 1}


def test_connected_components_nonconvergence_raises(spark):
    import pytest as _pytest

    from ocr_output_evaluation_spark.operators.components import connected_components

    n = 8  # chain needs n-1 hash-min rounds; cap below that must raise
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)


def test_connected_components_random_graph_matches_union_find(spark):
    """Randomized (seeded) graph: the distributed hash-min result must equal
    a single-process union-find on the same edges — components, membership,
    and representative (min id) all identical."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.components import connected_components

    rng = np.random.RandomState(23)
    n = 200
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in rng.randint(0, n, size=(300, 2)) if a != b}

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: component = min node id reachable
    want = {}
    roots = {}
    for x in range(n):
        roots.setdefault(find(x), []).append(x)
    for members in roots.values():
        rep = min(members)
        for m in members:
            want[m] = rep

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(nodes, edf, max_iter=50).collect()}
    assert got == want


def test_embedding_near_dup_hot_bucket_guard(spark):
    """A direction shared by > max_bucket vectors must be dropped before the
    quadratic candidate join (degenerate-bucket guard), while normal small
    clusters in the same corpus still surface."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(5)
    hot = rng.randn(8)
    small = rng.randn(8)
    rows = [(i, (hot * (1.0 + 1e-6 * i)).tolist()) for i in range(30)]  # hot direction
    rows += [(100 + j, (small + rng.randn(8) * 1e-3).tolist()) for j in range(3)]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    guarded = embedding_near_dup_pairs(
        df, "v", "id", threshold=0.999, n_planes=8, seed=3, max_bucket=10
    ).collect()
    ids = {r.id_a for r in guarded} | {r.id_b for r in guarded}
    assert ids == {100, 101, 102}  # hot direction dropped, small cluster kept
    assert len(guarded) == 3  # C(3,2)

    unguarded = embedding_near_dup_pairs(
        df, "v", "id", threshold=0.999, n_planes=8, seed=3, max_bucket=10_000
    )
    assert unguarded.count() == 3 + 30 * 29 // 2  # cap off -> hot pairs appear


def test_minhash_md5_oracle_variant_finds_planted_dups(spark):
    """The oracle-grade md5 LSH family must behave like the xxhash64 scale
    path on planted near-dups (full correctness is the DuckDB oracle gate —
    queries.minhash_pairs_md5)."""
    from ocr_output_evaluation_spark.operators.dedup import minhash_lsh_pairs_md5

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank where the old mill stands and the miller works all day long"
    )
    rows = [
        (1, base),
        (2, base + " indeed"),
        (3, "a completely different text about spark shuffle exchanges and "
            "broadcast joins in adaptive query execution plans at scale"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs_md5(df, "text", "doc_id", jaccard_threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_md5_oracle_variant_finds_planted_dups(spark):
    """The oracle-grade md5 SimHash family behaves like the xxhash64 scale
    path on planted near-dups (full correctness is the DuckDB oracle gate —
    queries.simhash_pairs_md5)."""
    from ocr_output_evaluation_spark.operators.dedup import simhash_near_dup_pairs_md5

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank where the old mill stands and the miller works all day long"
    )
    rows = [
        (1, base),
        (2, base.replace("quiet", "silent")),
        (3, "entirely unrelated words about catalyst optimizer rules and "
            "whole stage codegen boundaries in modern query engines today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_near_dup_pairs_md5(df, "text", "doc_id", max_hamming=6).collect()}
    assert (1, 2) in got
    assert all(3 not in k for k in got)


def test_cohort_retention_semantics(spark, sf_dir):
    """A19: every user contributes to active_week 0 of their own cohort;
    cell counts are positive; the matrix is totally ordered; and the
    cohort-day-0 week-0 cell equals the number of users whose first
    event lands on the corpus's first day."""
    rows = QUERIES["cohort_retention_report"](spark, sf_dir).collect()
    assert rows, "matrix must not be empty"
    keys = [(r.cohort_day, r.active_week) for r in rows]
    assert keys == sorted(keys)
    assert all(r.n_users > 0 for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first = ev.select("user_id", us.alias("u")).groupBy("user_id").agg(
        F.min("u").alias("f")
    )
    g0 = first.agg(F.min("f")).collect()[0][0]
    day = 86_400 * 1_000_000
    want_day0 = first.filter((F.col("f") - g0) < day).count()
    got = {(r.cohort_day, r.active_week): r.n_users for r in rows}
    assert got[(0, 0)] == want_day0
    # week-0 cells per cohort must count every user of that cohort:
    # no cohort's later-week cell may exceed its week-0 cell
    for (cd, aw), n in got.items():
        assert n <= got[(cd, 0)]


def test_drift_psi_semantics(spark, sf_dir):
    """X60: a snapshot diffed against ITSELF must score exactly zero PSI
    in every bucket (p == q term-for-term); the report's shifted
    snapshot must score strictly positive total drift."""
    from ocr_output_evaluation_spark.queries import drift_psi_report

    rows = drift_psi_report(spark, sf_dir).collect()
    assert len(rows) == 16
    assert all(r.total_psi_nano == rows[0].total_psi_nano for r in rows)
    assert rows[0].total_psi_nano > 0  # planted +3/+4 char shifts drift

    # self-drift: rebuild the same pipeline with B == A via the operator
    # arithmetic — p == q makes every term exactly 0.0
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    K = 16
    clamp = "least(greatest(CAST(n_chars AS BIGINT), 0), 2047)"
    c = (
        docs.select(F.expr(f"div({clamp}, 128)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    na = docs.count()
    grid = spark.range(K).select(F.col("id").alias("bucket"))
    j = grid.join(c, "bucket", "left").fillna(0, ["n"])
    p = (F.col("n") + 1).cast("double") / F.lit(float(na + K))
    ratio = F.lit(1.0)
    term = (p - p) * F.log(ratio)
    zeros = j.select(
        F.round(term * F.lit(1e9)).cast("long").alias("z")
    ).collect()
    assert all(r.z == 0 for r in zeros)


def test_langid_confusion_identities(spark, sf_dir):
    """A20: confusion identities — tp+fn == class size, Σ(tp+fp) == total
    non-null predictions, F1 is the harmonic mean of P and R (checked via
    the exact rational identity f1·(2tp+fp+fn) ≈ 2tp in ppm units), and
    metrics are NULL only when their denominator is zero."""
    from ocr_output_evaluation_spark.queries import langid_confusion_report

    rows = langid_confusion_report(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in rows:
        assert r.tp + r.fn == sizes[r.lang]
        assert r.tp >= 0 and r.fp >= 0 and r.fn >= 0
        if r.tp + r.fp == 0:
            assert r.precision_ppm is None
        else:
            want = (2 * r.tp * 10**6 + (r.tp + r.fp)) // (2 * (r.tp + r.fp))
            assert r.precision_ppm == want
        if 2 * r.tp + r.fp + r.fn > 0:
            want = (2 * (2 * r.tp) * 10**6 + (2 * r.tp + r.fp + r.fn)) // (
                2 * (2 * r.tp + r.fp + r.fn)
            )
            assert r.f1_ppm == want


def test_calibration_identities(spark, sf_dir):
    """A21: Σn == corpus size, n_pos <= n per bin, ECE equals the exact
    weighted integer mean of the per-bin gaps, identical on every row."""
    from ocr_output_evaluation_spark.queries import calibration_report

    rows = calibration_report(spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    assert all(0 <= r.n_pos <= r.n for r in rows)
    want_ece = sum(r.gap_micro * r.n for r in rows) // sum(r.n for r in rows)
    assert all(r.ece_micro == want_ece for r in rows)
    assert all(
        r.gap_micro == abs(r.mean_pred_micro - r.mean_label_micro)
        for r in rows
    )
