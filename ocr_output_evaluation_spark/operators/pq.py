"""Product-quantization ANN: per-subspace k-means codebooks, compact codes,
asymmetric-distance (ADC) top-k search.

The published recipe (Jégou, Douze & Schmid 2011, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 33(1)): split each d-dim vector into m
subvectors, train an independent k-means codebook per subspace, store each
vector as its m nearest-centroid indices (m·log2(k) bits), and answer a
query by summing per-subspace distances between the query's subvectors and
the centroids named by each stored code (ADC). Completes the ANN family
next to brute-force / LSH / IVF (operators/similarity.py, ann_index.py).
Reference-repo analog: none (training-data/SURVEY §2.13 layer).

Spark-first shape, and how it holds at 100 TB:
- codebook training follows the X40 deterministic-Lloyd pattern but trains
  ALL m subspaces in one pass per iteration: assignment is a zero-shuffle
  literal-array map producing m code columns at once; the update is ONE
  map-side-combined (subspace, cid, dim) mean, collected (m·k·d/m = k·d
  values — tiny) and re-quantized to 6dp (the quantize-the-loop-state
  trick, so the DuckDB oracle replays every iteration bit-exactly).
- encoding is in-row (no join); codes are m small ints per vector —
  the 8-byte-per-vector memory story that makes PQ the billion-vector
  index format.
- ADC search scans codes only: the reconstruction ∑_s centroid[code_s] is
  materialized in-row from the literal codebook and the query distance is
  one expression → global top-k via TakeOrderedAndProject. Zero shuffle,
  zero join; at cluster scale the scan prunes to code columns (column
  pruning pins this).
- determinism: seeds are the k vectors of smallest md5(salt||id) (shared
  across subspaces — a legitimate fixed draw; the paper's random init is
  replaced, no RNG), all distances rounded to 6dp before comparison, ties
  → smallest centroid id / smallest vector id. Distances are squared L2
  (the paper's metric).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PQ_SEED_SALT = "pq-seed-v1:"


def _round6(c: Column) -> Column:
    return F.round(c, 6)


def _sq_l2(sub: Column, lit_centroid: list[float]) -> Column:
    """Squared L2 between an array slice and a literal centroid — the
    zip_with/aggregate fold (index order, double accumulation: the exact
    shape the DuckDB UNNEST-sum twin reproduces)."""
    q = F.array(*[F.lit(float(x)) for x in lit_centroid])
    return F.aggregate(
        F.zip_with(sub, q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_code(sub: Column, codebook: list[list[float]]) -> Column:
    """1-based index of the nearest centroid (6dp-rounded squared L2,
    first-minimum → smallest id on ties — array_position(array_min))."""
    d = F.array(*[_round6(_sq_l2(sub, c)) for c in codebook])
    return F.array_position(d, F.array_min(d)).cast("long")


def pq_seed_codebooks(
    vecs: DataFrame, vec_col: str, id_col: str, m: int, k: int, dim: int
) -> list[list[list[float]]]:
    """-> codebooks[s][j] = the j-th seed centroid of subspace s: the k
    vectors of smallest md5(salt||id), sliced into m subvectors, 6dp.
    One tiny collect (k full vectors)."""
    h = F.md5(F.concat(F.lit(PQ_SEED_SALT), F.col(id_col).cast("string")))
    rows = (
        vecs.select(
            F.transform(F.col(vec_col), lambda x: F.round(x.cast("double"), 6)).alias("_v"),
            h.alias("_h"),
            id_col,
        )
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    sub = dim // m
    return [
        [[float(x) for x in r._v[s * sub : (s + 1) * sub]] for r in rows]
        for s in range(m)
    ]


def pq_train(
    vecs: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Train all m per-subspace codebooks (k centroids each) with
    deterministic Lloyd iterations — every subspace advances in the SAME
    pass: one zero-shuffle assignment map + one map-side-combined
    (subspace, cid, dim) mean per iteration, collected and 6dp-quantized.
    Returns codebooks[s][j] (driver-side, m·k·(dim/m) floats — tiny)."""
    sub = dim // m
    books = pq_seed_codebooks(vecs, vec_col, id_col, m, k, dim)
    base = vecs.select(
        id_col, F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col)
    )
    for _ in range(iters):
        coded = base.select(
            id_col,
            vec_col,
            *[
                _argmin_code(
                    F.slice(F.col(vec_col), s * sub + 1, sub), books[s]
                ).alias(f"_c{s}")
                for s in range(m)
            ],
        )
        # one exchange: (subspace, cid, pos) partial means over all subspaces
        stacked = coded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"_c{s}").alias("cid"),
                            F.slice(F.col(vec_col), s * sub + 1, sub).alias("sv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e")
        ).select("e.s", "e.cid", F.posexplode("e.sv").alias("pos", "x"))
        means = (
            stacked.groupBy("s", "cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("mean"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r.s, r.cid), {})[r.pos] = r.mean
        books = [
            [
                [got[(s, j + 1)][p] for p in sorted(got[(s, j + 1)])]
                if (s, j + 1) in got
                else books[s][j]  # empty cell keeps its previous centroid
                for j in range(k)
            ]
            for s in range(m)
        ]
    return books


def pq_encode(
    vecs: DataFrame,
    vec_col: str,
    id_col: str,
    books: list[list[list[float]]],
) -> DataFrame:
    """-> (id_col, code ARRAY<BIGINT> length m): each vector's per-subspace
    nearest-centroid indices — the PQ compressed representation (in-row,
    no join, no shuffle)."""
    m = len(books)
    sub = len(books[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return vecs.select(
        F.col(id_col),
        F.array(
            *[
                _argmin_code(F.slice(v, s * sub + 1, sub), books[s])
                for s in range(m)
            ]
        ).alias("code"),
    )


def pq_adc_top_k(
    codes: DataFrame,
    id_col: str,
    books: list[list[list[float]]],
    query: list[float],
    top_k: int = 10,
) -> DataFrame:
    """ADC search over the code frame: adc = Σ_s ||q_s − centroid[code_s]||²
    (each per-subspace term 6dp-rounded — the lookup-table values of the
    paper, summed in subspace order), global top-k ascending with the id as
    tiebreak (TakeOrderedAndProject). Scans CODES only — the vector column
    is never touched at query time."""
    m = len(books)
    sub = len(books[0][0])
    # per-subspace flat distance tables: entry (s, j) = d(q_s, books[s][j])
    # — computed as literal-expression folds so the DuckDB twin reproduces
    # them from ITS OWN centroid CTEs with the same UNNEST-sum shape
    def table(s: int) -> Column:
        qs = query[s * sub : (s + 1) * sub]
        return F.array(*[_round6(_sq_l2(F.array(*[F.lit(float(x)) for x in qs]), c)) for c in books[s]])

    # NB: _sq_l2's first arg is a column; wrap the literal query slice once
    adc = None
    for s in range(m):
        term = F.element_at(table(s), F.element_at(F.col("code"), s + 1).cast("int"))
        adc = term if adc is None else adc + term
    return (
        codes.select(id_col, "code", adc.alias("adc"))
        .orderBy(F.asc("adc"), F.col(id_col))
        .limit(top_k)
        .select(id_col, _round6(F.col("adc")).alias("adc"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ composite (the FAISS IVFPQ layout, Jégou et al. 2011 §IV): a coarse
# quantizer routes vectors to cells; RESIDUALS (v − coarse centroid) are
# PQ-encoded; a query probes only its nearest cells and ADC-scans their
# codes. At scale this is THE billion-vector shape: the cell id is a
# partition column (probing = partition pruning — the scan never touches
# unprobed cells) and each row is m small ints. Fully deterministic: the
# coarse quantizer is pq_train with m=1, residot encoding reuses the same
# quantized-Lloyd machinery, probes are chosen by a Spark-computed 6dp
# distance ranking (engine-parity with the DuckDB oracle, no python float).
# ---------------------------------------------------------------------------
def _coarse_cell(vec_col: Column, coarse: list[list[float]]) -> Column:
    return _argmin_code(vec_col, coarse)


def _residual(vec_col: Column, coarse: list[list[float]], cell: Column) -> Column:
    """v − coarse[cell], via one literal array-of-arrays lookup (in-row)."""
    tbl = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in coarse])
    cc = F.element_at(tbl, cell.cast("int"))
    return F.zip_with(vec_col, cc, lambda x, y: x.cast("double") - y)


def ivfpq_build(
    vecs: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 2,
):
    """-> (coarse, books, codes): the coarse codebook (n_cells full-dim
    centroids, trained as pq_train m=1), the residual PQ codebooks, and
    the code frame (id_col, cell BIGINT, code ARRAY<BIGINT>). Residuals
    are computed in-row (no join); write `codes` partitioned by `cell` so
    probing prunes partitions."""
    coarse = pq_train(vecs, vec_col, id_col, m=1, k=n_cells, dim=dim, iters=iters)[0]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cell = _coarse_cell(v, coarse)
    resid = vecs.select(
        F.col(id_col),
        cell.alias("cell"),
        _residual(v, coarse, cell).alias("_resid"),
    )
    books = pq_train(resid, "_resid", id_col, m=m, k=k, dim=dim, iters=iters)
    sub = dim // m
    codes = resid.select(
        id_col,
        "cell",
        F.array(
            *[
                _argmin_code(F.slice(F.col("_resid"), s * sub + 1, sub), books[s])
                for s in range(m)
            ]
        ).alias("code"),
    )
    return coarse, books, codes


def ivfpq_probe_cells(
    spark, coarse: list[list[float]], query: list[float], n_probe: int
) -> list[int]:
    """The n_probe cells nearest the query — ranked BY SPARK (6dp squared
    L2, cell-id tiebreak) over a literal n_cells-row frame, so the choice
    is bit-identical to the DuckDB oracle's replay (a driver-side python
    ranking would reintroduce python-float rounding)."""
    rows = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(coarse)], "cell long, cv array<double>"
    )
    ranked = (
        rows.select("cell", _round6(_sq_l2(F.col("cv"), query)).alias("d"))
        .orderBy("d", "cell")
        .limit(n_probe)
        .collect()
    )
    return [int(r.cell) for r in ranked]


def ivfpq_top_k(
    codes: DataFrame,
    id_col: str,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    query: list[float],
    n_probe: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """ADC over the probed cells only: filter cell ∈ probes (partition
    pruning when codes are cell-partitioned), per-cell residual query
    q − coarse[cell], per-subspace 6dp table lookups summed in subspace
    order, global top-k ascending (TakeOrderedAndProject)."""
    spark = codes.sparkSession
    probes = ivfpq_probe_cells(spark, coarse, query, n_probe)
    m = len(books)
    sub = len(books[0][0])

    def cell_adc(cell: int) -> Column:
        qr = [query[p] - coarse[cell - 1][p] for p in range(len(query))]
        # qr is literal-arithmetic on Spark-rounded inputs — exact doubles the
        # oracle reproduces with the same subtraction
        adc = None
        for s in range(m):
            qs = qr[s * sub : (s + 1) * sub]
            tbl = F.array(
                *[
                    _round6(_sq_l2(F.array(*[F.lit(float(x)) for x in qs]), c))
                    for c in books[s]
                ]
            )
            term = F.element_at(
                tbl, F.element_at(F.col("code"), s + 1).cast("int")
            )
            adc = term if adc is None else adc + term
        return adc

    score = F.when(F.col("cell") == probes[0], cell_adc(probes[0]))
    for cell in probes[1:]:
        score = score.when(F.col("cell") == cell, cell_adc(cell))
    # chained whens stay linear here (n_probe branches, no self-reference —
    # not the 2^n running-best trap)
    return (
        codes.filter(F.col("cell").isin([int(c) for c in probes]))
        .select(id_col, "cell", "code", score.alias("adc"))
        .orderBy(F.asc("adc"), F.col(id_col))
        .limit(top_k)
        .select(id_col, F.col("cell"), _round6(F.col("adc")).alias("adc"))
    )
