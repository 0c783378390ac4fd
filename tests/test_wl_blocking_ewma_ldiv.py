"""Unit tests for session-12 batch 4: WL color refinement, ER blocking
quality, truncated EWMA, l-diversity."""

import datetime

from ddaugner_spark.operators import er, graph, privacy, temporal


def test_wl_path_graph_separates_center(spark):
    # P3: a-b-c — endpoints are WL-equivalent, the center is not
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["a", "b"])
    out = sorted(
        (r["n_nodes"] for r in graph.wl_refinement(edges, rounds=2).collect())
    )
    assert out == [1, 2]


def test_wl_isomorphic_components_share_colors(spark):
    # two disjoint edges: all four nodes structurally identical
    edges = spark.createDataFrame([("x", "y"), ("u", "v")], ["a", "b"])
    out = graph.wl_refinement(edges, rounds=2).collect()
    assert len(out) == 1 and out[0]["n_nodes"] == 4


def test_wl_distinguishes_star_from_triangle(spark):
    # triangle nodes all one color; star center/leaves two colors,
    # and (crucially) leaves ≠ triangle nodes even though both start
    # with low degrees
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("s", "l1"), ("s", "l2"), ("s", "l3")],
        ["a", "b"],
    )
    hist = {r["wl_label"]: r["n_nodes"] for r in
            graph.wl_refinement(edges, rounds=2).collect()}
    assert sorted(hist.values()) == [1, 3, 3]


def test_blocking_quality_counts(spark):
    # 'spark' (len 5) gets variant 'sark'; 'org' (len 3) gets none.
    # amp(PER) = {spark, sark, org} → n_surfaces 3, allpairs 3,
    # candidates: (sark, spark) lev 1 same block ✓; (org, spark)/(org,
    # sark) different first letter → blocked out. PC = 1, RR = 1 - 1/3.
    surfaces = spark.createDataFrame(
        [("spark", "PER", 5), ("org", "PER", 2)],
        ["surface", "tag", "n_mentions"],
    )
    r = er.blocking_quality(surfaces, max_dist=2).collect()[0]
    assert (r["n_surfaces"], r["n_truth"], r["n_cand"], r["n_hit"]) == (3, 1, 1, 1)
    assert r["pc"] == 1.0 and r["rr"] == 0.666667


def test_ewma_halving_decay(spark):
    # one event at hour 0, grid stretched to hour 2 by a far event at
    # hour 2 → ewma halves per tick: 0.5, 0.25, 0.125 + the hour-2
    # event's own 0.5
    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    ev = spark.createDataFrame(
        [(1, ts(0), "u", "t", 1.0), (2, ts(2), "u", "t", 1.0)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = {r["bucket"]: r["ewma"] for r in
           temporal.ewma_truncated(ev).collect()}
    base = int(ts(0).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert out[base] == 0.5
    assert out[base + 3600] == 0.25
    assert out[base + 7200] == 0.625  # 0.125 decayed + 0.5 fresh


def test_l_diversity_flags_homogeneous_class(spark):
    rows = (
        [(i, "s1", "en", 150) for i in range(4)]          # 1 lang → leaky
        + [(10, "s2", "en", 150), (11, "s2", "fr", 150),
           (12, "s2", "de", 150), (13, "s2", "de", 150)]  # 3 langs → safe
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "lang", "n_chars"])
    out = {r["source"]: r for r in privacy.l_diversity(docs, l_req=3).collect()}
    assert not out["s1"]["diverse"] and out["s1"]["l_distinct"] == 1
    assert out["s2"]["diverse"] and out["s2"]["l_distinct"] == 3
    # dominant value of s2 is 'de' (2 of 4)
    assert out["s2"]["top_sensitive"] == "de" and out["s2"]["top_n"] == 2


def test_l_diversity_top_tie_prefers_lex_smaller(spark):
    rows = [(0, "s", "fr", 10), (1, "s", "de", 10)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "lang", "n_chars"])
    assert privacy.l_diversity(docs).collect()[0]["top_sensitive"] == "de"
