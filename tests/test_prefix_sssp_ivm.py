"""Prefix-filter all-pairs Jaccard (lossless vs inverted index),
weighted Bellman-Ford SSSP (cost improves after first discovery), and
rollup IVM merge equality."""

import pyspark.sql.functions as F

from ddaugner_spark.operators.dedup import (
    all_pairs_jaccard_prefix,
    jaccard_pairs_inverted,
)
from ddaugner_spark.operators.graph import shortest_paths_weighted
from ddaugner_spark.operators.temporal import hypertable_rollup, merge_rollups


def _corpus(spark):
    # near-dups (0,1), (2,3); 4 unrelated; 5 shares a stop-shingle run
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i k"),
        (2, "p q r s t u v w"),
        (3, "p q r s t u v x"),
        (4, "m n o zz yy xx"),
        (5, "a b c zz yy xx qq rr ss tt uu vv ww"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_is_lossless_vs_inverted(spark):
    """The prefix-filter join must emit EXACTLY the inverted-index
    ground truth at the same (k, tau) — completeness above the
    threshold is the algorithm's lemma, pinned here."""
    c = _corpus(spark)
    nonempty = 0
    for tau in (0.3, 0.5, 0.75):
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in all_pairs_jaccard_prefix(c, k=3, threshold=tau).collect()
        }
        exp = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_pairs_inverted(
                c, k=3, threshold=tau, max_doc_freq=10**9
            ).collect()
        }
        assert got == exp, f"tau={tau}"
        nonempty += bool(exp)
    # the comparison must not be vacuous: J(0,1) = 7/9 ≈ 0.78 survives
    # every tau tested, so all three rounds compare real pairs
    assert nonempty == 3


def test_prefix_index_smaller_than_full(spark):
    """At tau=0.5 the prefix index holds about half the postings — the
    scale claim (index size ~ (1-tau) fraction) on real numbers."""
    from ddaugner_spark.operators.dedup import shingles

    c = _corpus(spark)
    full = shingles(c, 3).count()
    sizes = shingles(c, 3).groupBy("doc_id").agg(F.count("*").alias("n"))
    prefix = sizes.select(
        F.sum(F.col("n") - F.ceil(0.5 * F.col("n")) + 1)
    ).collect()[0][0]
    assert prefix < full  # strictly smaller index
    assert prefix <= full * 0.7  # and materially so at tau=0.5


def test_sssp_improves_cost_after_discovery(spark, tmp_path):
    """seed -> x costs 10 direct (1 hop) but 3 via y (2 hops): a BFS
    first-discovery rule would lock in 10; Bellman-Ford must relax to
    3. Node z beyond max_hops must be absent."""
    edges = spark.createDataFrame(
        [("s", "x", 10), ("s", "y", 1), ("y", "x", 2), ("x", "z", 1)],
        "a string, b string, w long",
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    out = {
        r["node"]: r["cost"]
        for r in shortest_paths_weighted(
            edges, seeds, max_hops=2, stage_dir=str(tmp_path)
        ).collect()
    }
    # z is reached within 2 hops only via the expensive s->x->z = 11
    assert out == {"s": 0, "y": 1, "x": 3, "z": 11}

    out3 = {
        r["node"]: r["cost"]
        for r in shortest_paths_weighted(
            edges, seeds, max_hops=3, stage_dir=str(tmp_path / "h3")
        ).collect()
    }
    assert out3["z"] == 4  # via the relaxed x


def test_merge_rollups_equals_full_recompute(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 3, i % 24), "t%d" % (i % 2), float(i) / 7)
        for i in range(200)
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    base = e.filter(F.col("event_id") % 4 < 3)
    delta = e.filter(F.col("event_id") % 4 == 3)
    merged = merge_rollups(
        [
            hypertable_rollup(base, "ts", "value", 3600, ["event_type"]),
            hypertable_rollup(delta, "ts", "value", 3600, ["event_type"]),
        ],
        ["event_type"],
    )
    full = hypertable_rollup(e, "ts", "value", 3600, ["event_type"])
    m = {
        (r["bucket_ts"], r["event_type"]): (r["n"], round(r["sum_v"], 6))
        for r in merged.collect()
    }
    f = {
        (r["bucket_ts"], r["event_type"]): (r["n"], round(r["sum_v"], 6))
        for r in full.collect()
    }
    assert m == f and f
