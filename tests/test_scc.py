"""Strongly connected components by min-label FW/BW peeling
(operators/canonical.py strongly_connected_components)."""

import pytest

from ddaugner_spark.operators.canonical import strongly_connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _sccs(spark, pairs, **kw):
    out = strongly_connected_components(_edges(spark, pairs), **kw).collect()
    comp = {}
    for r in out:
        comp.setdefault(r.scc_id, set()).add(r.node)
    return {frozenset(v): k for k, v in comp.items()}, {r.node: r.scc_id for r in out}


def test_cycle_with_tail(spark):
    comps, by_node = _sccs(
        spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    )
    assert by_node == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_pollution_needs_second_peel(spark):
    # SCC {c,d} is downstream of {a,b}: c's forward label is polluted
    # by 'a' until round 1 peels {a,b} — pins the multi-round path
    stats = {}
    comps, by_node = _sccs(
        spark,
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")],
        stats=stats,
    )
    assert by_node == {"a": "a", "b": "a", "c": "c", "d": "c"}
    rounds = [p for p in stats["peels"] if "round" in p]
    assert len(rounds) == 2 and rounds[0]["remaining"] == 2


def test_dag_is_all_singletons(spark):
    comps, by_node = _sccs(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert by_node == {"a": "a", "b": "b", "c": "c"}


def test_self_loop_singleton_and_min_id(spark):
    comps, by_node = _sccs(
        spark, [("z", "z"), ("m", "q"), ("q", "m"), ("q", "z")]
    )
    assert by_node == {"z": "z", "m": "m", "q": "m"}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        strongly_connected_components(
            _edges(spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c")]),
            max_peel_rounds=1,
        ).collect()


def test_fixpoint_nonconvergence_raises(spark):
    # a 6-cycle needs ~5 min-propagation hops; a 2-iteration budget
    # must RAISE, not silently peel wrong components
    ring = [(f"v{i}", f"v{(i + 1) % 6}") for i in range(6)]
    with pytest.raises(RuntimeError, match="fixpoint"):
        strongly_connected_components(
            _edges(spark, ring), max_fix_rounds=2
        ).collect()
