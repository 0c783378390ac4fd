"""KMV distinct-count sketch: accuracy bound vs exact, merge property
(union of bottom-k sketches == sketch of the union), exactness below k,
and repartition invariance (the map-side partial must not change the
result)."""

import pyspark.sql.functions as F

from ddaugner_spark.operators.sketches import kmv_sketch


def _est(spark, df, k=64):
    return {
        r["event_type"]: (r["n_distinct_est"], r["n_kept"])
        for r in kmv_sketch(df, "event_type", "user_id", k=k).collect()
    }


def test_accuracy_vs_exact(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    got = _est(spark, e, k=64)
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        est = got[t][0]
        if got[t][1] < 64:
            assert est == float(n), (t, est, n)  # below k: exact
        else:
            assert abs(est - n) / n < 0.5, (t, est, n)  # ~1/sqrt(64)·few


def test_repartition_invariant(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    assert _est(spark, e) == _est(spark, e.repartition(17))


def test_merge_property(spark, sf_dir):
    """Sketching two halves and merging (which kmv does internally via
    the groupBy over partials) equals sketching the whole: pin by
    splitting the input into disjoint halves unioned back."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    a = e.filter(F.col("user_id") % 2 == 0)
    b = e.filter(F.col("user_id") % 2 == 1)
    assert _est(spark, a.unionByName(b)) == _est(spark, e)


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("x", i % 7) for i in range(100)], "event_type string, user_id long"
    )
    got = _est(spark, df, k=64)
    assert got["x"] == (7.0, 7)


def test_kmv_null_handling(spark):
    """NULL values are ignored (COUNT(DISTINCT) semantics); NULL group
    keys are kept as their own group; all-NULL-value groups produce no
    row (review finding, round 3)."""
    from ddaugner_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), (None, 1), (None, 1), ("b", None)],
        "g string, v int",
    )
    rows = {r["g"]: (r["n_distinct_est"], r["n_kept"]) for r in
            kmv_sketch(df, "g", "v", k=8).collect()}
    assert rows["a"] == (2.0, 2)     # NULL value ignored
    assert rows[None] == (1.0, 1)    # NULL group kept
    assert "b" not in rows           # all-NULL group: no row


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

from ddaugner_spark.operators.sketches import cm_estimate, cm_sketch


def _cm_docs(spark):
    rows = [(i, "a " * 8 + "b " * 4 + "c " * 2 + "d") for i in range(1, 4)]
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")


def test_cm_overestimates_never_under(spark):
    toks = _cm_docs(spark)
    sk = cm_sketch(toks, "token", depth=4, width=2)  # heavy collisions
    est = {r.value: r.est for r in cm_estimate(sk, toks, "token", 4, 2).collect()}
    exact = {r.token: r.cnt for r in
             toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)


def test_cm_exact_when_wide(spark):
    toks = _cm_docs(spark)
    sk = cm_sketch(toks, "token", depth=4, width=4096)
    est = {r.value: r.est for r in cm_estimate(sk, toks, "token", 4, 4096).collect()}
    exact = {r.token: r.cnt for r in
             toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    assert est == exact


def test_cm_width_one_gives_total(spark):
    toks = _cm_docs(spark)
    total = toks.count()
    sk = cm_sketch(toks, "token", depth=2, width=1)
    est = {r.value: r.est for r in cm_estimate(sk, toks, "token", 2, 1).collect()}
    assert all(v == total for v in est.values())


def test_cm_cells_merge_by_addition(spark):
    d1 = spark.createDataFrame([(1, "x x y z")], "doc_id long, text string")
    d2 = spark.createDataFrame([(2, "x y y w")], "doc_id long, text string")
    t1 = d1.select(F.explode(F.split("text", " ")).alias("token"))
    t2 = d2.select(F.explode(F.split("text", " ")).alias("token"))
    both = t1.unionAll(t2)
    merged = (
        cm_sketch(t1, "token", 3, 4).unionAll(cm_sketch(t2, "token", 3, 4))
        .groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cm_sketch(both, "token", 3, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cm_repartition_invariant(spark):
    toks = _cm_docs(spark)
    one = sorted(map(tuple, cm_sketch(toks.coalesce(1), "token", 4, 8).collect()))
    many = sorted(map(tuple, cm_sketch(toks.repartition(7), "token", 4, 8).collect()))
    assert one == many


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_docs(spark, n, group="g"):
    """n distinct synthetic values under one group, deterministic."""
    return spark.range(n).select(
        F.lit(group).alias("grp"),
        F.concat(F.lit("val_"), F.col("id").cast("string")).alias("v"),
    )


def test_hll_accuracy_vs_exact(spark):
    """Raw-regime relative error ≈ 1.04/√m (m=64 → 13%); allow 4σ."""
    from ddaugner_spark.operators.sketches import hll_estimate, hll_registers

    for n in (500, 5000):
        regs = hll_registers(_hll_docs(spark, n), "grp", "v", p=6)
        est = hll_estimate(regs, "grp", p=6).first()["est"]
        assert abs(est - n) / n < 0.52, (n, est)


def test_hll_linear_counting_small_range(spark):
    """Below 2.5·m with empty registers the estimator switches to
    linear counting m·ln(m/zeros) — far tighter than raw down here."""
    from ddaugner_spark.operators.sketches import hll_estimate, hll_registers

    for n in (10, 40, 100):
        regs = hll_registers(_hll_docs(spark, n), "grp", "v", p=6)
        row = hll_estimate(regs, "grp", p=6).first()
        assert row["n_zero"] > 0
        assert abs(row["est"] - n) / n < 0.35, (n, row["est"])


def test_hll_registers_merge_by_max(spark):
    """max-merge of the halves' registers == registers of the union —
    the property that makes HLL shippable per shard/epoch."""
    from ddaugner_spark.operators.sketches import hll_registers

    docs = _hll_docs(spark, 2000)
    a = docs.filter(F.crc32("v") % 2 == 0)
    b = docs.filter(F.crc32("v") % 2 == 1)
    merged = (
        hll_registers(a, "grp", "v", p=6)
        .unionByName(hll_registers(b, "grp", "v", p=6))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(docs, "grp", "v", p=6)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_hll_repartition_invariant(spark):
    from ddaugner_spark.operators.sketches import hll_estimate, hll_registers

    docs = _hll_docs(spark, 3000)
    e1 = hll_estimate(hll_registers(docs, "grp", "v", p=6), "grp", p=6).first()
    e2 = hll_estimate(
        hll_registers(docs.repartition(16), "grp", "v", p=6), "grp", p=6
    ).first()
    assert tuple(e1) == tuple(e2)


def test_hll_gate_corpora_are_raw_regime(spark):
    """q_hll_distinct runs correct=False (the linear-counting branch
    uses libm ln, whose last ulp may differ across engines); that is
    honest only while every gate corpus keeps every lang's shingle
    cardinality in the raw regime (raw est > 2.5·m).  Pin it for every
    corpus the driver gate can run."""
    import glob

    from ddaugner_spark.operators.dedup import shingles
    from ddaugner_spark.operators.sketches import hll_estimate, hll_registers

    for sf in sorted(glob.glob("/root/testdata/sf*")):
        docs = spark.read.parquet(f"{sf}/documents.parquet").filter(
            F.col("text").isNotNull()
        )
        shingled = shingles(docs, extra_cols=("lang",)).select("lang", "shingle")
        regs = hll_registers(shingled, "lang", "shingle", p=6)
        raw = hll_estimate(regs, "lang", p=6, correct=False)
        for r in raw.collect():
            assert r["est"] > 2.5 * 64, (sf, r)


# ---------------------------------------------------------------- kmv set ops
from ddaugner_spark.operators.sketches import kmv_mins, kmv_set_ops


def _sides(spark, a_vals, b_vals):
    a = spark.createDataFrame([("g", v) for v in a_vals], "g string, v string")
    b = spark.createDataFrame([("g", v) for v in b_vals], "g string, v string")
    return kmv_mins(a, "g", "v", k=64), kmv_mins(b, "g", "v", k=64)


def test_setops_exact_below_k(spark):
    """Both sides under k distinct: every estimate is EXACT set algebra."""
    a_vals = [f"x{i}" for i in range(30)]
    b_vals = [f"x{i}" for i in range(20, 50)]  # |A|=30 |B|=30 |A∩B|=10 |A∪B|=50
    ma, mb = _sides(spark, a_vals, b_vals)
    r = kmv_set_ops(ma, mb, "g", k=64).collect()[0]
    assert (r.est_a, r.est_b, r.est_union) == (30.0, 30.0, 50.0)
    assert r.est_intersect == 10.0
    assert r.jaccard_est == round(10 / 50, 6)


def test_setops_disjoint_and_identical(spark):
    ma, mb = _sides(spark, [f"a{i}" for i in range(10)], [f"b{i}" for i in range(10)])
    r = kmv_set_ops(ma, mb, "g", k=64).collect()[0]
    assert (r.est_union, r.est_intersect, r.jaccard_est) == (20.0, 0.0, 0.0)
    ma, mb = _sides(spark, [f"c{i}" for i in range(10)], [f"c{i}" for i in range(10)])
    r = kmv_set_ops(ma, mb, "g", k=64).collect()[0]
    assert (r.est_union, r.est_intersect, r.jaccard_est) == (10.0, 10.0, 1.0)


def test_setops_estimator_accuracy_above_k(spark):
    """1500/1500 distinct with 500 shared: estimates within ~3/√k."""
    a_vals = [f"v{i}" for i in range(1500)]
    b_vals = [f"v{i}" for i in range(1000, 2500)]
    ma, mb = _sides(spark, a_vals, b_vals)
    r = kmv_set_ops(ma, mb, "g", k=64).collect()[0]
    tol = 3 / 8  # 3/sqrt(64)
    assert abs(r.est_a - 1500) / 1500 < tol
    assert abs(r.est_union - 2500) / 2500 < tol
    assert abs(r.est_intersect - 500) / 500 < 2 * tol  # ratio-of-estimates


def test_setops_union_sketch_equals_sketch_of_union(spark):
    """The merged bottom-k IS the KMV sketch of A ∪ B (merge property
    lifted to set ops): est_union == kmv_sketch over the unioned data."""
    a_vals = [f"v{i}" for i in range(900)]
    b_vals = [f"v{i}" for i in range(600, 1700)]
    ma, mb = _sides(spark, a_vals, b_vals)
    got = kmv_set_ops(ma, mb, "g", k=64).collect()[0].est_union
    u = spark.createDataFrame(
        [("g", v) for v in set(a_vals) | set(b_vals)], "g string, v string"
    )
    want = kmv_sketch(u, "g", "v", k=64).collect()[0].n_distinct_est
    assert got == want


def test_setops_one_sided_group_survives(spark):
    """A group with data on only one side reports one-sided estimates
    (full-outer semantics) instead of vanishing."""
    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(12)] + [("only_a", "z")],
        "g string, v string",
    )
    b = spark.createDataFrame([("g", f"x{i}") for i in range(6, 18)],
                              "g string, v string")
    out = {r.g: r for r in kmv_set_ops(
        kmv_mins(a, "g", "v", k=64), kmv_mins(b, "g", "v", k=64), "g", k=64
    ).collect()}
    r = out["only_a"]
    assert (r.est_a, r.est_b, r.est_union, r.est_intersect) == (1.0, 0.0, 1.0, 0.0)
    assert out["g"].est_intersect == 6.0
