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
