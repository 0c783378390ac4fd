"""Round-5 session-10 batch 10: hub-removal robustness, peak session
concurrency, dispersion index.

Micro-fixtures; corpus-scale engine↔oracle parity pinned by
tools/parity_check.py (q_hub_robustness, q_peak_concurrency,
q_dispersion).
"""

import datetime as dt

from ddaugner_spark.operators.events import peak_concurrency
from ddaugner_spark.operators.graph import hub_robustness
from ddaugner_spark.operators.stats import dispersion_index


def test_hub_robustness_star_shatters(spark, tmp_path):
    # star centered on h plus one separate edge x-y: removing the hub h
    # shatters the star; x-y survives
    edges = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"), ("x", "y")],
        ["a", "b"],
    )
    out = {
        r.phase: r
        for r in hub_robustness(edges, k=1, stage_dir=str(tmp_path)).collect()
    }
    full = out["full"]
    assert (full.n_nodes, full.n_edges, full.n_components) == (7, 5, 2)
    assert full.largest == 5
    cut = out["hubs_removed"]
    # hub h removed: only x-y remains as an edge-bearing subgraph
    assert (cut.n_edges, cut.n_components, cut.largest) == (1, 1, 2)


def _ev(spark, rows):
    """rows: (event_id, user, minute)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=m), u, "e", 1.0, "{}")
            for i, u, m in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_peak_concurrency_overlap(spark):
    # user 1 session [0, 10]; user 2 [5, 15]; user 3 [120, 125]
    rows = [
        (0, 1, 0), (1, 1, 10),
        (2, 2, 5), (3, 2, 15),
        (4, 3, 120), (5, 3, 125),
    ]
    r = peak_concurrency(_ev(spark, rows), gap_s=1800).collect()[0]
    assert r.n_sessions == 3
    assert r.peak == 2
    # earliest instant achieving the peak = user 2's start (minute 5)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    assert r.peak_at_us == int(
        (base + dt.timedelta(minutes=5)).timestamp() * 1_000_000
    )


def test_peak_concurrency_point_sessions_count(spark):
    # user 1: gap 40min > 30min -> two point sessions [0,0], [40,40];
    # user 2: one point session [40,40].  Closed-interval convention:
    # both point sessions at minute 40 are concurrently active.
    rows = [(0, 1, 0), (1, 1, 40), (2, 2, 40)]
    r = peak_concurrency(_ev(spark, rows), gap_s=1800).collect()[0]
    assert r.n_sessions == 3
    assert r.peak == 2
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    assert r.peak_at_us == int(
        (base + dt.timedelta(minutes=40)).timestamp() * 1_000_000
    )


def test_dispersion_index_values(spark):
    base = dt.datetime(2024, 1, 1)
    # type a: constant values -> variance 0, vmr 0
    # type b: values 1.00 and 3.00 -> mean 2.00, var (in dollars) 1.0
    #   -> vmr = 1.0/2.0 = 0.5
    rows = [("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 3.0)]
    ev = spark.createDataFrame(
        [(i, base, 1, t, v, "{}") for i, (t, v) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    out = {r.series: r for r in dispersion_index(ev, "event_type", "value").collect()}
    assert out["a"].mean == 5.0 and out["a"].vmr == 0.0
    assert not out["a"].overdispersed
    assert out["b"].mean == 2.0 and out["b"].vmr == 0.5
