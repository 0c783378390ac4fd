"""Round-5 session-10 batch 7: incremental ER maintenance, item-item
CF recommendations, percentile-rank normalization.

The q_er_incremental gate entry is the strongest check here: its
DuckDB oracle is the FULL BATCH recompute, so every parity run proves
incremental == batch on the corpus.  These tests pin the same property
plus the blast-radius behavior on micro-graphs.
"""

import datetime as dt
import json

from ddaugner_spark.operators.canonical import connected_components
from ddaugner_spark.operators.er import er_incremental
from ddaugner_spark.operators.events import item_recs
from ddaugner_spark.operators.stats import percentile_rank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_er_incremental_equals_batch(spark, tmp_path):
    old = [("a", "b"), ("c", "d"), ("e", "f")]
    new = [("b", "c"), ("x", "y")]  # merges {a,b}+{c,d}; brand-new {x,y}
    old_assign = connected_components(
        _edges(spark, old), stage_dir=str(tmp_path / "old")
    )
    inc = {
        (r.entity, r.component)
        for r in er_incremental(
            old_assign, _edges(spark, new), str(tmp_path / "inc")
        ).collect()
    }
    batch = {
        (r.entity, r.component)
        for r in connected_components(
            _edges(spark, old + new), stage_dir=str(tmp_path / "batch")
        ).collect()
    }
    assert inc == batch
    assert ("d", "a") in inc          # merged cluster takes min label
    assert ("f", "e") in inc          # untouched cluster passes through
    assert ("y", "x") in inc          # new-entity cluster resolved


def test_er_incremental_untouched_majority_passthrough(spark, tmp_path):
    old = [(f"n{i:02d}a", f"n{i:02d}b") for i in range(10)]
    old_assign = connected_components(
        _edges(spark, old), stage_dir=str(tmp_path / "old")
    )
    # one new edge touches only cluster 03
    inc = er_incremental(
        old_assign, _edges(spark, [("n03b", "n03c")]), str(tmp_path / "i")
    )
    out = {(r.entity, r.component) for r in inc.collect()}
    assert ("n03c", "n03a") in out
    assert ("n07b", "n07a") in out
    assert len(out) == 21


def _ev(spark, rows):
    """rows: (event_id, user, item)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base, u, "view", 1.0, json.dumps({"k": it}))
            for i, u, it in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_item_recs_recommends_cooccurring_unseen(spark):
    # users 1-3 engage {10, 20}; user 4 engages only {10}
    rows = [
        (0, 1, 10), (1, 1, 20),
        (2, 2, 10), (3, 2, 20),
        (4, 3, 10), (5, 3, 20),
        (6, 4, 10),
    ]
    out = item_recs(_ev(spark, rows), k_top=3).collect()
    recs = {(r.user_id, r.item): r for r in out}
    assert (4, 20) in recs
    # sim(10,20): c_10=4, c_20=3, c_ij=3 -> 1e6*9/12 = 750000
    assert recs[(4, 20)].score_milli == 750000
    assert recs[(4, 20)].rank == 1
    # users who saw everything get no rows
    assert not any(r.user_id == 1 and r.item in (10, 20) for r in out)


def test_pct_rank_tie_averaged(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, "a", 1.0), (1, "a", 2.0), (2, "a", 2.0), (3, "a", 3.0),
    ]
    ev = spark.createDataFrame(
        [(i, base, 1, g, v, "{}") for i, g, v in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    out = {
        r.id: r.pct
        for r in percentile_rank(ev, "event_type", "value", "event_id").collect()
    }
    # ranks: 1, 2.5, 2.5, 4 of n=4 -> pct 0.25, 0.625, 0.625, 1.0
    assert out[0] == 0.25
    assert out[1] == out[2] == 0.625
    assert out[3] == 1.0
