"""Column profiles, MAD outliers, logistic inference (operators/stats.py)
and zone maps / compaction planning (operators/layout.py)."""

import math

import pyspark.sql.functions as F

from ddaugner_spark.operators.layout import (
    compaction_plan,
    with_zorder,
    zone_maps,
    zone_scan_flag,
)
from ddaugner_spark.operators.stats import (
    column_stats,
    logistic_score,
    mad_outliers,
)


def test_column_stats_counts_nulls_and_ndv(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")],
        "id long, s string",
    )
    out = {r["column"]: r for r in column_stats(df, ["id", "s"]).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["ndv"] == 3
    assert out["id"]["min_s"] == "1" and out["id"]["max_s"] == "3"
    assert out["s"]["n_null"] == 1 and out["s"]["ndv"] == 2
    assert out["s"]["min_s"] == "a" and out["s"]["max_s"] == "b"


def test_mad_outliers_flags_and_zero_mad_guard(spark):
    # group g: symmetric around 10 with one wild point; group c: constant
    rows = [("g", i, v) for i, v in enumerate([8, 9, 10, 11, 12, 1000])]
    rows += [("c", 100 + i, 5) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = {r["id"]: r for r in mad_outliers(df, "grp", "v", 3.5).collect()}
    # median of g = 10.5, MAD = median(|x-10.5|) = 1.5
    assert out[5]["is_outlier"]  # 1000 is wildly out
    assert not out[2]["is_outlier"]
    assert out[2]["robust_z"] == round(0.6745 * (10 - 10.5) / 1.5, 6)
    for i in range(100, 104):  # constant group: MAD=0 -> z=0, no outliers
        assert out[i]["robust_z"] == 0.0 and not out[i]["is_outlier"]


def test_logistic_score_matches_closed_form(spark):
    df = spark.createDataFrame([(0.5, 1.0), (0.0, 0.0)], "a double, b double")
    got = sorted(
        r[0]
        for r in df.select(
            logistic_score(df, {"a": 2.0, "b": -1.0}, bias=0.5)
        ).collect()
    )
    exp = sorted(
        1.0 / (1.0 + math.exp(-(0.5 + 2.0 * a - b))) for a, b in [(0.5, 1.0), (0.0, 0.0)]
    )
    for g, e in zip(got, exp):
        assert math.isclose(g, e, rel_tol=1e-12)


def test_zone_maps_prune_range_predicate(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 64, 4) for y in range(0, 64, 4)],
        "x long, y long",
    )
    z = with_zorder(df, ["x", "y"], bits=6, buckets=4)
    zm = zone_maps(z, "zbucket", ["x", "y"]).withColumn(
        "scan", zone_scan_flag("y", F.lit(0), F.lit(10))
    )
    rows = zm.collect()
    assert sum(r["n_rows"] for r in rows) == 16 * 16
    # y in [0,10] lives in the low-y buckets only: some file must be pruned
    assert any(not r["scan"] for r in rows)
    for r in rows:  # flags consistent with the maps they derive from
        assert r["scan"] == (not (r["y_max"] < 0 or r["y_min"] > 10))


def test_compaction_plan_carves_by_running_sum(spark):
    files = spark.createDataFrame(
        [("p", 0, 900), ("p", 1, 900), ("p", 2, 900), ("p", 3, 5000), ("p", 4, 100)],
        "part string, idx long, size long",
    )
    out = {
        r["bin"]: r
        for r in compaction_plan(files, "size", 2000, "idx", "part").collect()
    }
    # bins by bytes-before/2000: 0,900,1800 -> bin 0; 2700 -> bin 1; 7700 -> bin 3
    assert out[0]["n_files"] == 3 and out[0]["bin_bytes"] == 2700
    assert out[1]["n_files"] == 1 and out[1]["first_file"] == 3
    assert out[3]["n_files"] == 1 and out[3]["first_file"] == 4
    assert set(out) == {0, 1, 3}


def test_bucketed_join_plans_zero_exchanges(spark, tmp_path):
    """Two 8-bucket tables keyed on k: their equi-join + groupBy(k)
    aggregate must plan with NO Exchange at all — the shuffle was paid
    at write time. This is the co-located-join contract bucketing
    exists for."""
    from ddaugner_spark.operators.layout import write_bucketed

    a = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("x")
    )
    b = spark.range(0, 500).select(
        (F.col("id") % 37).alias("k"), (F.col("id") * 2).alias("y")
    )
    write_bucketed(a, "t_bkt_a", "k", 8, str(tmp_path / "a"))
    write_bucketed(b, "t_bkt_b", "k", 8, str(tmp_path / "b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: the claim under test is that
        # bucketing removes the SHUFFLE, not that broadcast would
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            spark.table("t_bkt_a")
            .join(spark.table("t_bkt_b"), "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # and the values are right: per-k pair counts multiply
        row = {r["k"]: (r["n"], r["sy"]) for r in out.collect()}
        na = {r["k"]: r["n"] for r in a.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
        nb = {r["k"]: r["n"] for r in b.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
        for k, (n, _) in row.items():
            assert n == na[k] * nb[k]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_snapshot_diff_statuses(spark):
    from ddaugner_spark.operators.crawl import snapshot_diff

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B"), ("u4", "d")], "url string, text string"
    )
    out = {r["url"]: r["status"] for r in snapshot_diff(old, new, "url", ["text"]).collect()}
    # u1 unchanged -> absent; u2 changed; u3 removed; u4 added
    assert out == {"u2": "changed", "u3": "removed", "u4": "added"}


def test_filter_stack_reason_precedence_and_dedup(spark):
    """First-failing-rule attribution: a short duplicate reads 'short',
    not 'duplicate'; the duplicate keeper survives as keep; reasons are
    exhaustive."""
    from ddaugner_spark.operators.stats import filter_stack

    good = (
        "the quick brown fox jumps over a lazy dog while the bright sun "
        "warms a calm green field and small birds sing near tall old trees"
    )  # 128 chars, ttr 0.92, stopword ratio 4/26
    rows = [
        (1, good),
        (2, good),                      # exact dup of 1 -> duplicate
        (3, "tiny"),                    # short
        (4, (good + " ") * 4),          # long (516 chars > 500)
        (5, "the " * 40),               # low_ttr (2 distinct / 41)
        (6, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg ff ee dd cc bb aa zz2 yy2 xx2 ww2 vv2 uu2"),  # no stopwords
        (7, "x"),                       # short AND duplicate-of-nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in filter_stack(df, ["the", "a"]).collect()}
    assert out[1]["reason"] == "keep" and out[1]["keep"]
    assert out[2]["reason"] == "duplicate" and not out[2]["keep"]
    assert out[3]["reason"] == "short"
    assert out[4]["reason"] == "long"
    assert out[5]["reason"] == "low_ttr"
    assert out[6]["reason"] == "low_stopword"
    assert out[7]["reason"] == "short"
    assert set(r["reason"] for r in out.values()) <= {
        "short", "long", "low_ttr", "low_stopword", "duplicate", "keep"
    }


def test_chi2_independence_exact_and_degenerate(spark):
    """2×2 table with known χ² (hand formula) and Cramér's V = √(χ²/n);
    a perfectly independent table gives χ² = 0; a single-level margin
    gives dof 0 / chi2 0 / V 0."""
    from ddaugner_spark.operators.stats import chi2_independence

    def tbl(cells):
        rows = []
        for (r, c), k in cells.items():
            rows.extend([(r, c)] * k)
        return spark.createDataFrame(rows, "lang string, source string")

    # dependent 2x2: [[10, 20], [30, 5]]
    out = chi2_independence(
        tbl({("a", "x"): 10, ("a", "y"): 20, ("b", "x"): 30, ("b", "y"): 5}),
        "lang",
        "source",
    ).collect()[0]
    n, cells = 65, [(10, 30, 40), (20, 30, 25), (30, 35, 40), (5, 35, 25)]
    chi2 = sum((o * n - rn * cn) ** 2 / (n * rn * cn) for o, rn, cn in cells)
    assert out["n"] == 65 and out["dof"] == 1
    assert out["chi2"] == round(chi2, 6)
    assert out["cramers_v"] == round(math.sqrt(chi2 / n), 6)

    # independent: counts proportional to row x col margins
    ind = chi2_independence(
        tbl({("a", "x"): 4, ("a", "y"): 8, ("b", "x"): 2, ("b", "y"): 4}),
        "lang",
        "source",
    ).collect()[0]
    assert ind["chi2"] == 0.0 and ind["cramers_v"] == 0.0

    # degenerate: one column level only
    deg = chi2_independence(
        tbl({("a", "x"): 3, ("b", "x"): 7}), "lang", "source"
    ).collect()[0]
    assert deg["dof"] == 0 and deg["chi2"] == 0.0 and deg["cramers_v"] == 0.0
