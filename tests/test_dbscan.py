"""DBSCAN-lite over a similarity pair graph (operators/density.py)."""

from pyspark.sql import functions as F

from ddaugner_spark.operators.density import dbscan_lite


def _run(spark, node_ids, pairs, min_pts=3):
    nodes = spark.createDataFrame([(n,) for n in node_ids], ["node"])
    p = spark.createDataFrame(pairs, ["a", "b"])
    out = dbscan_lite(nodes, p, min_pts=min_pts).collect()
    return {r.node: (r.role, r.cluster_id) for r in out}


def test_core_border_noise_roles(spark):
    # triangle 1-2-3 (each deg 2 -> core at min_pts=3); 4 hangs off 3
    # (deg 1 -> border); 5 isolated -> noise
    got = _run(spark, [1, 2, 3, 4, 5], [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert got[1] == ("core", 1)
    assert got[2] == ("core", 1)
    assert got[3] == ("core", 1)
    assert got[4] == ("border", 1)
    assert got[5] == ("noise", -1)


def test_two_clusters_and_min_assignment(spark):
    # two 4-cliques at min_pts=4 (deg 3 + self = 4 -> core); 7 touches
    # one core of each (deg 2 -> non-core) -> border with MIN cluster
    def clique(ns):
        return [(a, b) for a in ns for b in ns if a < b]

    pairs = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(3, 7), (10, 7)]
    got = _run(spark, [1, 2, 3, 4, 7, 10, 11, 12, 13], pairs, min_pts=4)
    assert got[10] == ("core", 10)
    assert got[1] == ("core", 1)
    assert got[7] == ("border", 1)


def test_bridge_point_merges_clusters_when_core(spark):
    # the classic DBSCAN chain effect: a bridge with enough degree is
    # itself core and fuses the two triangles into one cluster
    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 7), (10, 7)]
    got = _run(spark, [1, 2, 3, 7, 10, 11, 12], pairs, min_pts=3)
    assert got[7] == ("core", 1)
    assert got[10] == ("core", 1)


def test_pair_of_points_is_noise_at_minpts3(spark):
    # an isolated near-dup PAIR: deg 1 each, no cores anywhere near
    got = _run(spark, [1, 2], [(1, 2)])
    assert got[1] == ("noise", -1) and got[2] == ("noise", -1)


def test_singleton_core_cluster(spark):
    # star center 1 with spokes 2,3 (deg 2 -> core); spokes deg 1 ->
    # borders of the center's singleton-core cluster
    got = _run(spark, [1, 2, 3], [(1, 2), (1, 3)])
    assert got[1] == ("core", 1)
    assert got[2] == ("border", 1) and got[3] == ("border", 1)


def test_duplicate_pairs_do_not_inflate_degree(spark):
    # regression: the pair input is deduped — a duplicated (1,2) edge
    # used to count node 1's single neighbour twice, promoting a
    # degree-1 point to core at min_pts=3
    got = _run(spark, [1, 2], [(1, 2), (1, 2)])
    assert got[1] == ("noise", -1) and got[2] == ("noise", -1)
