"""Jaro-Winkler block pairs, greedy maximal matching, Resource-
Allocation link prediction (operators/er.py jw_block_pairs,
operators/graph.py greedy_matching / resource_allocation).

Pins: the JW kernel against DuckDB's builtin (the oracle contract is
bit-identity), textbook Winkler pairs, matching validity + maximality
on hand graphs and a 300-edge random graph, RA on a hand-counted
wedge graph.
"""

import random

import duckdb
import pytest

from ddaugner_spark.operators.er import _jaro_winkler_py, jw_block_pairs
from ddaugner_spark.operators.graph import greedy_matching, resource_allocation


# ---------------------------------------------------------------- JW

def test_jw_kernel_bit_identical_to_duckdb():
    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(2000):
        a = "".join(rng.choices("abcdef", k=rng.randint(0, 10)))
        b = "".join(rng.choices("abcdef", k=rng.randint(0, 10)))
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == want, (a, b)


def test_jw_textbook_pairs():
    # Winkler's canonical examples (boost applied above 0.7)
    assert _jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111
    )
    assert _jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(
        0.8133333333333332
    )
    assert _jaro_winkler_py("abc", "abc") == 1.0
    assert _jaro_winkler_py("abc", "xyz") == 0.0
    assert _jaro_winkler_py("", "abc") == 0.0


def test_jw_block_pairs_scores_within_blocks(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Ashcroft",), ("Lee",)],
        ["token"],
    )
    rows = {
        (r.form_a, r.form_b): r.jw
        for r in jw_block_pairs(df, threshold=0.5).collect()
    }
    # same soundex block AND high JW
    assert ("Ashcraft", "Ashcroft") in rows
    assert rows[("Ashcraft", "Ashcroft")] == pytest.approx(0.95, abs=1e-6)
    # Lee is alone in its block: no pair
    assert not any("Lee" in k for k in rows)


# ---------------------------------------------------------- matching

def _check_matching(edges, matched):
    nodes = [n for e in matched for n in e]
    assert len(nodes) == len(set(nodes)), "a node matched twice"
    es = {tuple(sorted(e)) for e in edges}
    assert all(tuple(sorted(e)) in es for e in matched)
    # maximality: no remaining edge with both endpoints free
    used = set(nodes)
    assert not [
        e for e in es if e[0] not in used and e[1] not in used
    ], "matching not maximal"


def test_matching_triangle(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    got = [(r.src, r.dst) for r in greedy_matching(e).collect()]
    assert len(got) == 1
    _check_matching([("a", "b"), ("b", "c"), ("a", "c")], got)


def test_matching_random_graph_valid_and_maximal(spark):
    rng = random.Random(13)
    edges = list(
        {
            tuple(sorted((f"n{rng.randint(0, 60)}", f"n{rng.randint(0, 60)}")))
            for _ in range(300)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = [(r.src, r.dst) for r in greedy_matching(df, rounds=8).collect()]
    _check_matching(edges, got)


def test_matching_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert greedy_matching(e, rounds=2).count() == 0


# ---------------------------------------------------------------- RA

def test_resource_allocation_hand_counted(spark):
    # star: hub h connects a,b,c; plus a-b edge.
    # non-adjacent pairs through h: (a,c),(b,c) share only h (deg 3);
    # (a,b) is adjacent -> excluded. a-b edge gives wedges (h?)
    e = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b")], ["src", "dst"]
    )
    got = {(r.node_a, r.node_b): r.ra for r in resource_allocation(e).collect()}
    # deg(h)=3, deg(a)=deg(b)=2, deg(c)=1
    # (a,c): common neighbor h -> 1/3; (b,c): h -> 1/3
    # (c,h) adjacent; (a,b) adjacent; (a,h) adjacent
    assert set(got) == {("a", "c"), ("b", "c")}
    assert got[("a", "c")] == pytest.approx(1 / 3, abs=1e-9)
    assert got[("b", "c")] == pytest.approx(1 / 3, abs=1e-9)


def test_resource_allocation_two_hubs_sum(spark):
    # u and v both connect to w1 (deg 2 each side -> deg(w1)=2) and
    # w2: ra(u,v) = 1/deg(w1) + 1/deg(w2) = 1/2 + 1/2
    e = spark.createDataFrame(
        [("u", "w1"), ("v", "w1"), ("u", "w2"), ("v", "w2")], ["src", "dst"]
    )
    got = {(r.node_a, r.node_b): r.ra for r in resource_allocation(e).collect()}
    assert got[("u", "v")] == pytest.approx(1.0, abs=1e-9)
