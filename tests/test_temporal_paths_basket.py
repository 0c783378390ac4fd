"""Time-respecting KG paths (triples.temporal_join_paths) and
market-basket lift (q_copurchase_lift invariants)."""

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators.triples import temporal_join_paths

import __spark_entry__ as E


def _validity(spark, rows):
    """rows: (subj, pred, obj, fs, ls, n_assertions)."""
    return spark.createDataFrame(
        rows, ["subj", "pred", "obj", "fs", "ls", "n_assertions"]
    )


def test_overlap_required(spark):
    v = _validity(
        spark,
        [
            ("a", "p", "m", 0, 3, 5),
            ("m", "q", "c", 2, 6, 5),   # overlaps [2,3]
            ("m", "q", "d", 4, 9, 5),   # disjoint from [0,3]
        ],
    )
    out = temporal_join_paths(v).collect()
    got = {(r.entity_a, r.entity_c): (r.ov_start, r.ov_end, r.ov_days) for r in out}
    assert got == {("a", "c"): (2, 3, 2)}


def test_boundary_day_counts(spark):
    v = _validity(
        spark,
        [("a", "p", "m", 0, 2, 1), ("m", "q", "c", 2, 5, 1)],
    )
    r = temporal_join_paths(v).collect()[0]
    assert (r.ov_start, r.ov_end, r.ov_days) == (2, 2, 1)


def test_fanout_cap_keeps_best_attested(spark):
    rows = [("a%d" % i, "p", "m", 0, 9, 10 - i) for i in range(6)] + [
        ("m", "q", "c", 0, 9, 1)
    ]
    out = temporal_join_paths(_validity(spark, rows), fanout_cap=2).collect()
    # only the 2 best-attested h1 legs survive the cap
    assert sorted(r.entity_a for r in out) == ["a0", "a1"]


def test_copurchase_invariants(spark, sf_dir):
    rows = E.q_copurchase_lift(spark, sf_dir).collect()
    assert rows, "expected co-purchase pairs at sf0.001"
    for r in rows[:200]:
        assert r.part_a < r.part_b
        assert r.n_co >= 2
        assert r.n_co <= min(r.n_a, r.n_b)
        assert 0 < r.conf_ab <= 1.0
        assert r.lift > 0
