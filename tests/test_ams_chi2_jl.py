"""AMS F2 sketch, chi-square feature selection, quantized JL
projection (operators/sketches.py ams_f2, textstats.py chi2_tokens,
embedding.py jl_project)."""

import math

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators.sketches import ams_f2
from ddaugner_spark.operators.textstats import chi2_tokens
from ddaugner_spark.operators.embedding import jl_project


def test_ams_exact_f2_and_shape(spark):
    # counts: a×3, b×2, c×1 -> F2 = 9 + 4 + 1 = 14
    toks = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], ["tok"]
    )
    row = ams_f2(toks, n_estimators=16).collect()[0]
    assert (row.k, row.exact_f2) == (16, 14)
    # unbiased estimator of a tiny stream: sanity-bound only
    assert row.est_f2 > 0
    assert row.rel_err == pytest.approx(
        abs(row.est_f2 - row.exact_f2) / row.exact_f2, abs=1e-6
    )


def test_ams_estimate_concentrates(spark):
    # one heavy item dominates: every Z_e = ±cnt, so est == F2 exactly
    toks = spark.createDataFrame([("only",)] * 7, ["tok"])
    row = ams_f2(toks, n_estimators=8).collect()[0]
    assert row.exact_f2 == 49
    assert row.est_f2 == pytest.approx(49.0)
    assert row.rel_err == pytest.approx(0.0)


def _docs(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_chi2_hand_value(spark):
    # token "hot": in all 4 pos docs, 0 of 4 neg docs ->
    # a=4 b=0 c=0 d=4, chi2 = 8*16*16/(4*4*4*4) = 8
    rows = [(i, "hot x", "en", "s") for i in range(4)] + [
        (i + 4, "cold x", "de", "s") for i in range(4)
    ]
    out = chi2_tokens(_docs(spark, rows), label=(F.col("lang") == "en"), min_df=2)
    got = {r.tok: r for r in out.collect()}
    hot = got["hot"]
    assert (hot.a, hot.b, hot.c, hot.d) == (4, 0, 0, 4)
    assert hot.chi2 == pytest.approx(8.0)
    # "x" is in every doc -> c+d margin zero -> guarded to 0
    assert got["x"].chi2 == 0.0


def test_chi2_min_df_bounds_output(spark):
    rows = [(1, "rare common", "en", "s"), (2, "common", "de", "s")]
    out = chi2_tokens(_docs(spark, rows), label=(F.col("lang") == "en"), min_df=2)
    assert {r.tok for r in out.collect()} == {"common"}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        ["vec_id", "embedding", "label"],
    )


def test_jl_shape_and_determinism(spark):
    vecs = [[0.1 * ((i + j) % 7 - 3) for j in range(64)] for i in range(6)]
    out = jl_project(_emb(spark, vecs), out_dim=16).collect()
    assert len(out) == 6 * 16
    again = jl_project(_emb(spark, vecs), out_dim=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_jl_preserves_distances_in_expectation(spark):
    # JL with k=16: squared-norm ratios concentrate around 1;
    # deterministic inputs, so pin a generous band
    vecs = [
        [math.sin(0.37 * (i * 64 + j)) for j in range(64)] for i in range(8)
    ]
    proj = jl_project(_emb(spark, vecs), out_dim=16)
    rows = proj.collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.j] = r.value
    for i, v in enumerate(vecs):
        orig = sum(x * x for x in v)
        p = by_vec[i]
        projected = sum(p[j] * p[j] for j in range(16))
        assert 0.3 < projected / orig < 3.0


def test_ams_join_size_single_key_exact(spark):
    from ddaugner_spark.operators.sketches import ams_join_size

    a = spark.createDataFrame([("k",)] * 3, ["item"])
    b = spark.createDataFrame([("k",)] * 2, ["item"])
    row = ams_join_size(a, b, "item", n_estimators=8).collect()[0]
    # one shared key: Za = ±3 and Zb = ±2 with the SAME sign, so every
    # estimator yields exactly 6 — the estimate is exact
    assert (row.k, row.exact_join) == (8, 6)
    assert row.est_join == pytest.approx(6.0)
    assert row.rel_err == pytest.approx(0.0)


def test_ams_join_size_disjoint_sentinel(spark):
    from ddaugner_spark.operators.sketches import ams_join_size

    a = spark.createDataFrame([("x",)], ["item"])
    b = spark.createDataFrame([("y",)], ["item"])
    row = ams_join_size(a, b, "item", n_estimators=4).collect()[0]
    assert (row.exact_join, row.rel_err) == (0, -1.0)
