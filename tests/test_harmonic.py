"""Multi-source BFS and seed-sampled harmonic centrality
(operators/graph.py)."""

import pytest

from ddaugner_spark.operators.graph import (
    harmonic_centrality_sample,
    multi_source_bfs,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_multi_source_per_seed_distances(spark):
    # path a-b-c; seeds {a, b} tracked separately
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    d = multi_source_bfs(_edges(spark, [("a", "b"), ("b", "c")]), seeds)
    got = {(r.node, r.seed): r.dist for r in d.collect()}
    assert got[("c", "a")] == 2 and got[("c", "b")] == 1
    assert got[("a", "b")] == 1 and got[("a", "a")] == 0


def test_harmonic_hand_value(spark):
    # path a-b-c-d: seeds (lexicographic) = a, b, c
    # d(node=d): dist to a=3, b=2, c=1 -> hx12 = 4+6+12 = 22
    out = harmonic_centrality_sample(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]), n_seeds=3
    )
    got = {r.node: r for r in out.collect()}
    assert (got["d"].n_reached, got["d"].hx12) == (3, 22)
    assert got["d"].harmonic == pytest.approx(22 / 12, abs=1e-6)
    # seed 'a' is reached by b (1) and c (2): hx12 = 12 + 6 = 18
    assert got["a"].hx12 == 18


def test_harmonic_depth_bound(spark):
    # chain of 6: the far end is 5 hops from 'a' -> only nearer seeds count
    chain = [(chr(97 + i), chr(98 + i)) for i in range(5)]  # a-b-c-d-e-f
    out = harmonic_centrality_sample(_edges(spark, chain), n_seeds=3)
    got = {r.node: r for r in out.collect()}
    # f: d(a)=5 (beyond 4, dropped), d(b)=4, d(c)=3 -> hx12 = 3 + 4
    assert (got["f"].n_reached, got["f"].hx12) == (2, 7)


def test_harmonic_requires_depth_four(spark):
    with pytest.raises(ValueError):
        harmonic_centrality_sample(_edges(spark, [("a", "b")]), max_depth=3)
