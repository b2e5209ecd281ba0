"""Stat-parity tests (SURVEY.md §5.2(3)): Spark aggs vs numpy/pandas on the
same data — mean/median/std(ddof=1)/linear-interp quantiles, NaN/inf triage,
salted-vs-direct aggregation equality, perplexity path parity."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.functions import (
    array_mean,
    array_median,
    array_percentile,
    array_stddev_samp,
    valid,
    valid_arr,
)
from ocr_output_evaluation_spark.operators import (
    group_stats,
    histogram,
    salted_group_stats,
    top_langs_pivoted,
    validity_class_aggs,
)

INF = float("inf")
NAN = float("nan")


@pytest.fixture(scope="module")
def conf_df(spark):
    rows = [
        ("a", 0.95), ("a", 0.8), ("a", 0.91), ("a", NAN), ("a", INF), ("a", 0.4),
        ("b", 0.5), ("b", 0.62), ("b", None), ("b", 0.99), ("b", -INF),
        ("c", NAN), ("c", INF),
    ]
    return spark.createDataFrame(rows, "grp string, conf double")


def pandas_clean(vals):
    s = pd.Series(vals, dtype="float64")
    return s.replace([INF, -INF], np.nan).dropna()


class TestValidTriage:
    def test_valid_maps_junk_to_null(self, spark):
        df = spark.createDataFrame(
            [(0.5,), (NAN,), (INF,), (-INF,), (None,)], "x double"
        ).select(valid("x").alias("v"))
        vals = [r.v for r in df.collect()]
        assert vals.count(None) == 4 and 0.5 in vals

    def test_validity_counters_distinguish_classes(self, conf_df):
        row = conf_df.groupBy("grp").agg(*validity_class_aggs("conf", "conf")).filter(
            F.col("grp") == "a"
        ).collect()[0]
        assert row.n_nan_conf == 1 and row.n_inf_conf == 1 and row.n_valid_conf == 4

    def test_grouped_moments_match_pandas(self, conf_df, spark):
        got = {r.grp: r for r in group_stats(conf_df, ["grp"], "conf").collect()}
        pdf = conf_df.toPandas()
        for grp, sub in pdf.groupby("grp"):
            clean = pandas_clean(sub.conf)
            r = got[grp]
            if len(clean) == 0:
                assert r.mean_conf is None
                continue
            assert r.mean_conf == pytest.approx(clean.mean())
            assert r.median_conf == pytest.approx(clean.median())
            if len(clean) > 1:
                assert r.std_conf == pytest.approx(clean.std())  # ddof=1
            for p in (10, 25, 75, 90, 95):
                assert getattr(r, f"p{p}_conf") == pytest.approx(
                    clean.quantile(p / 100)
                ), (grp, p)


class TestArrayStats:
    def test_array_stats_match_numpy(self, spark):
        arrays = [
            [0.1, 0.5, 0.9, 0.7],
            [0.3],
            [0.2, NAN, 0.8, INF, 0.5],
            [],
        ]
        df = spark.createDataFrame([(a,) for a in arrays], "arr array<double>")
        v = valid_arr("arr")
        out = df.select(
            array_mean(v).alias("m"),
            array_median(v).alias("md"),
            array_stddev_samp(v).alias("sd"),
            array_percentile(v, 0.25).alias("q25"),
            F.size(v).alias("n"),
        ).collect()
        for row, arr in zip(out, arrays):
            clean = pandas_clean(arr)
            if len(clean) == 0:
                assert row.m is None
                continue
            assert row.m == pytest.approx(clean.mean())
            assert row.md == pytest.approx(clean.median())
            assert row.q25 == pytest.approx(clean.quantile(0.25))
            if len(clean) > 1:
                assert row.sd == pytest.approx(clean.std())
            assert row.n == len(clean)


class TestHistogram:
    def test_matches_formula_and_numpy_interior(self, spark):
        vals = [i / 100 for i in range(0, 101)] + [0.999, 1.0, 0.0, NAN, INF]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {r.bin: r["count"] for r in histogram(df, "x", nbins=20).collect()}
        # The documented contract: bin = min(floor((x-lo)/width), nbins-1).
        want: dict[int, int] = {}
        for v in pandas_clean(vals):
            b = min(int(math.floor(v / 0.05)), 19)
            want[b] = want.get(b, 0) + 1
        assert got == want
        assert sum(got.values()) == len(pandas_clean(vals))

    def test_matches_numpy_on_interior_values(self, spark):
        # Away from bin edges the formula agrees with np.histogram exactly.
        vals = [0.013 + 0.0437 * i for i in range(200)]
        vals = [v for v in vals if v <= 1.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {r.bin: r["count"] for r in histogram(df, "x", nbins=20).collect()}
        want, _ = np.histogram(vals, bins=20, range=(0, 1))
        assert [got.get(b, 0) for b in range(20)] == list(want)


class TestTopLangs:
    def test_pivoted_top3_deterministic_ties(self, spark):
        rows = [
            ("v1", ["en", "bo"]), ("v1", ["en"]), ("v1", ["zh", "bo"]), ("v1", ["fr"]),
            ("v2", ["de"]),
        ]
        df = spark.createDataFrame(rows, "vol string, languages array<string>")
        got = {r.vol: r for r in top_langs_pivoted(df, "vol", "languages").collect()}
        r = got["v1"]
        # counts: en=2, bo=2, zh=1, fr=1 → tie en/bo broken by lang asc → bo first
        assert (r.top_lang_1, r.top_lang_1_count) == ("bo", 2)
        assert (r.top_lang_2, r.top_lang_2_count) == ("en", 2)
        assert (r.top_lang_3, r.top_lang_3_count) == ("fr", 1)
        assert got["v2"].top_lang_2 is None


class TestSaltedAgg:
    def test_salted_equals_direct(self, spark):
        n = 5000
        df = spark.range(n).select(
            F.concat(F.lit("d"), (F.col("id") % 3).cast("string")).alias("domain"),
            F.col("id").cast("string").alias("url"),
            (F.col("id") % 97 / 97.0).alias("val"),
        )
        got = {
            r.domain: r
            for r in salted_group_stats(df, ["domain"], "val", "url", n_salts=8).collect()
        }
        want = {
            r.domain: r
            for r in df.groupBy("domain")
            .agg(
                F.count("val").alias("n"),
                F.mean("val").alias("mean"),
                F.stddev_samp("val").alias("std"),
                F.min("val").alias("min"),
                F.max("val").alias("max"),
            )
            .collect()
        }
        for d in want:
            assert got[d].n == want[d].n
            assert got[d].mean == pytest.approx(want[d].mean)
            assert got[d].std == pytest.approx(want[d].std)
            assert got[d].min == want[d].min and got[d].max == want[d].max

    def test_salted_variance_survives_large_offset(self, spark):
        """VERDICT r2 item 3: the merged variance must come from Chan-merged
        central moments (n, mean, M2), not raw sum-of-squares. With values
        offset by 1e12 (|mean| >> stddev — epoch-microsecond magnitudes),
        Σv² carries ~16 significant digits of offset and none of spread, so
        the raw form ((Σv² − n·mean²)/(n−1)) cancels catastrophically while
        the central-moment merge stays within float rounding of the truth."""
        n = 4000
        df = spark.range(n).select(
            F.lit("d").alias("domain"),
            F.col("id").cast("string").alias("url"),
            (F.col("id") % 97 / 97.0 + F.lit(1.0e12)).alias("val"),
        )
        got = salted_group_stats(df, ["domain"], "val", "url", n_salts=8).collect()[0]
        # truth: variance of (id % 97)/97 is offset-invariant
        import numpy as np

        vals = np.arange(n) % 97 / 97.0
        truth = float(np.var(vals, ddof=1))
        # 1e-3 rel is the honest single-pass bound at this condition number
        # (κ = mean/std ≈ 3.5e12): a float64 mean of magnitude 1e12 is
        # quantized at ~2e-4 absolute, so partial-mean deltas carry that
        # noise into the cross-partial term (measured ~7e-5 rel here).
        # numpy's two-pass subtracts the true mean and is eps-exact; the
        # point of this test is the 3+ orders of magnitude between the
        # stable merge (≤1e-3) and the raw sum-of-squares form (>1e-1,
        # asserted below — often the entire variance).
        assert got.var_samp == pytest.approx(truth, rel=1e-3)
        assert got.std == pytest.approx(truth**0.5, rel=1e-3)
        assert got.mean == pytest.approx(1.0e12 + float(np.mean(vals)), rel=1e-12)

        # prove the test has teeth: the raw sum-of-squares merge visibly
        # loses the variance at this offset (usually 100% of it)
        raw = (
            df.groupBy("domain")
            .agg(
                F.count("val").alias("rn"),
                F.sum("val").alias("rs"),
                F.sum(F.col("val") * F.col("val")).alias("rss"),
            )
            .select(
                (
                    (F.col("rss") - F.col("rn") * F.pow(F.col("rs") / F.col("rn"), 2))
                    / (F.col("rn") - 1)
                ).alias("rvar")
            )
            .collect()[0]
            .rvar
        )
        assert abs(raw - truth) > 0.1 * truth  # cancellation is real here


class TestPerplexity:
    def test_native_equals_udf_and_classes(self, spark):
        from ocr_output_evaluation_spark.fixtures.generate import reference_lm_pdf
        from ocr_output_evaluation_spark.operators.perplexity import (
            perplexity_native,
            score_ppl_py,
            with_perplexity,
        )
        from ocr_output_evaluation_spark.schema import REFERENCE_LM

        lm = spark.createDataFrame(reference_lm_pdf(), schema=REFERENCE_LM)
        docs = spark.createDataFrame(
            [
                ("u1", "the quick brown fox jumps over the lazy dog", "en"),
                ("u2", "der schnelle braune fuchs springt", "de"),
                ("u3", "", "en"),                      # NaN class -> NULL
                ("u4", "totally unseen zzzqqq text", "en"),  # OOV backoff
                ("u5", "some text", "xx"),             # rejection -> +inf
                ("u6", None, "en"),                    # NULL text -> NULL
                ("u7", "12345 !!!", "en"),             # normalizes to empty -> NULL
            ],
            "url string, extracted_text string, lang string",
        )
        native = {r.url: r.perplexity for r in perplexity_native(docs, lm).collect()}
        viaudf = {
            r.url: r.perplexity
            for r in with_perplexity(spark, docs, lm).select("url", "perplexity").collect()
        }
        lm_dict = {}
        for _, r in reference_lm_pdf().iterrows():
            lm_dict.setdefault(r.lang, {})[r.ngram] = r.logp
        for u, t, lg in [
            ("u1", "the quick brown fox jumps over the lazy dog", "en"),
            ("u2", "der schnelle braune fuchs springt", "de"),
            ("u3", "", "en"),
            ("u4", "totally unseen zzzqqq text", "en"),
            ("u5", "some text", "xx"),
            ("u6", None, "en"),
            ("u7", "12345 !!!", "en"),
        ]:
            want = score_ppl_py(t, lg, lm_dict)
            for got_map, name in ((native, "native"), (viaudf, "udf")):
                got = got_map[u]
                if want is None:
                    assert got is None, (u, name, got)
                elif math.isinf(want):
                    assert got == INF, (u, name, got)
                else:
                    assert got == pytest.approx(want, rel=1e-12), (u, name)

    def test_pipeline_scale_semantics(self, spark):
        # lower ppl for in-vocab language than for cross-language text
        from ocr_output_evaluation_spark.fixtures.generate import reference_lm_pdf
        from ocr_output_evaluation_spark.operators.perplexity import score_ppl_py

        lm_dict = {}
        for _, r in reference_lm_pdf().iterrows():
            lm_dict.setdefault(r.lang, {})[r.ngram] = r.logp
        good = score_ppl_py("the quick brown fox", "en", lm_dict)
        bad = score_ppl_py("shan shui feng yue tian", "en", lm_dict)
        assert good < bad


def test_approx_group_stats_within_tolerance(spark, sf_dir):
    """Sketch stats (percentile_approx KLL, approx_count_distinct HLL++)
    must track the exact forms within their documented error bounds — the
    scale-path contract. Sketches never feed the oracle gate (CLAUDE.md)."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.operators.stats import approx_group_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = approx_group_stats(
        li, ["l_returnflag"], "l_extendedprice", distinct_cols=["l_orderkey"]
    ).collect()
    exact = (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile(F.col("l_extendedprice"), F.lit(p)).alias(f"p{int(p*100)}")
                for p in (0.10, 0.25, 0.75, 0.90, 0.95)
            ],
            F.countDistinct("l_orderkey").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    ex = {r.l_returnflag: r for r in exact}
    assert len(approx) == len(exact) > 0
    for a in approx:
        e = ex[a.l_returnflag]
        for p in (10, 25, 75, 90, 95):
            got, want = getattr(a, f"approx_p{p}"), getattr(e, f"p{p}")
            # rank error <= n/accuracy; translate to a loose value tolerance
            assert abs(got - want) / max(abs(want), 1e-9) < 0.05, (p, got, want)
        assert abs(a.approx_nd_l_orderkey - e.nd) / e.nd < 0.08  # rsd=0.02, 4 sigma


def test_rolling_fingerprints_codegen_parity(spark, sf_dir):
    """The posexplode->agg fingerprint path must equal the interpreted
    F.aggregate fold for every doc, incl. empty/NULL text edge rows."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.functions.text import (
        rolling_fingerprint,
        rolling_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(90001, ""), (90002, None), (90003, "x" * 300)], "doc_id long, text string"
    )
    df = docs.unionByName(edge)
    want = {
        r.doc_id: r.fp
        for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    got = {r.doc_id: r.fp for r in rolling_fingerprints(df, F.col("text"), "doc_id").collect()}
    assert got == want
    assert got[90001] == 0 and got[90002] is None
