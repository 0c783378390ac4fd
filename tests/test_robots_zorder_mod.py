"""Session-9 batch 6: robots-exclusion evaluation (crawl.robots_eval),
Z-order keys (layout.zorder_key/with_zorder), community modularity
(graph.modularity), A/B z-test (events.ab_test)."""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from ddaugner_spark.operators import crawl, graph, layout
from ddaugner_spark.operators import events as evops


def _urls(spark, rows):
    return spark.createDataFrame(rows, "url string, host string, path string")


def test_robots_longest_match_and_allow_tie(spark):
    rules = spark.createDataFrame(
        [("h", "/private", False), ("h", "/private/pub", True),
         ("h", "/private/pub", False),  # same length as the allow -> allow wins
         ("g", "/", False)],
        "host string, prefix string, allow boolean",
    )
    urls = _urls(spark, [
        ("u1", "h", "/private/secret"),
        ("u2", "h", "/private/pub/x"),
        ("u3", "h", "/open"),
        ("u4", "g", "/anything"),
        ("u5", "nowhere", "/x"),
    ])
    got = {r["url"]: (r["allowed"], r["matched_rule"])
           for r in crawl.robots_eval(urls, rules).collect()}
    assert got["u1"] == (False, "/private")
    assert got["u2"] == (True, "/private/pub")   # longest match + allow tie
    assert got["u3"] == (True, None)             # no rule matches
    assert got["u4"] == (False, "/")
    assert got["u5"] == (True, None)             # host without rules


def _morton(x, y, bits=10):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_python(spark):
    rows = [(i, (i * 37) % 1024, (i * 91) % 1024) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"]: (r["zorder"], r["zbucket"]) for r in
           layout.with_zorder(df, ["x", "y"], bits=10, buckets=16).collect()}
    for i, x, y in rows:
        z = _morton(x, y)
        assert got[i] == (z, z >> 16)


def test_zorder_locality(spark):
    # nearby points share high bits; distant points don't
    df = spark.createDataFrame(
        [(0, 3, 3), (1, 4, 4), (2, 1000, 1000)], "id long, x long, y long"
    )
    got = {r["id"]: r["zorder"] for r in
           layout.with_zorder(df, ["x", "y"], bits=10).collect()}
    assert abs(got[0] - got[1]) < abs(got[0] - got[2])


def test_zorder_overflow_guard():
    with pytest.raises(ValueError):
        layout.zorder_key([F.col("a"), F.col("b")], bits=32)


def test_modularity_two_cliques(spark):
    # two triangles joined by one bridge edge; perfect 2-community split
    e = [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    edges = spark.createDataFrame(sorted(e), "a string, b string")
    labels = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "A"), ("x", "X"), ("y", "X"), ("z", "X")],
        "entity string, community string",
    )
    got = {r["community"]: r for r in graph.modularity(edges, labels).collect()}
    m = 7
    for c, d_tot in (("A", 7), ("X", 7)):
        r = got[c]
        assert (r["n_nodes"], r["e_in"], r["d_tot"]) == (3, 3, d_tot)
        assert r["contrib"] == pytest.approx(round(3 / m - (d_tot / (2 * m)) ** 2, 6))
    # Q > 0 for a good split
    assert sum(r["contrib"] for r in got.values()) > 0.2


def test_modularity_everything_one_community(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "a string, b string")
    labels = spark.createDataFrame(
        [("a", "C"), ("b", "C"), ("c", "C")], "entity string, community string"
    )
    r = graph.modularity(edges, labels).collect()[0]
    # e_in = m and d_tot = 2m -> contrib = 1 - 1 = 0
    assert r["contrib"] == pytest.approx(0.0)


def test_ab_test_split_and_z(spark):
    # 4 users: evens convert (>=2 purchases), odds don't
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u in range(4):
        n_purch = 3 if u % 2 == 0 else 0
        for _ in range(n_purch):
            rows.append((eid, base, u, "purchase")); eid += 1
        rows.append((eid, base, u, "view")); eid += 1
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    r = evops.ab_test(e, min_events=2).collect()[0]
    assert (r["n0"], r["c0"], r["n1"], r["c1"]) == (2, 2, 2, 0)
    assert (r["p0"], r["p1"]) == (1.0, 0.0)
    p = 0.5
    z = (0.0 - 1.0) / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 2))
    assert r["z"] == pytest.approx(round(z, 6))
    assert r["degenerate"] is False


def test_ab_test_degenerate_sentinel(spark):
    # nobody converts -> pooled p = 0 -> sentinel z, degenerate flag
    e = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 0, "view"),
         (1, dt.datetime(2024, 1, 1), 1, "view")],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    r = evops.ab_test(e).collect()[0]
    assert r["z"] == 0.0 and r["degenerate"] is True
