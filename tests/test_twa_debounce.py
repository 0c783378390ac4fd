"""Time-weighted average and gaps-and-islands debounce
(operators/temporal.py time_weighted_avg, debounce)."""

import datetime as dt

import pytest

from ddaugner_spark.operators.temporal import debounce, time_weighted_avg


def _events(spark, rows):
    """rows: (user_id, seconds_offset, value[, event_type])."""
    base = dt.datetime(2024, 1, 1)
    full = [
        (
            u,
            i,
            base + dt.timedelta(seconds=s),
            float(v),
            (r[3] if len(r) > 3 else "view"),
        )
        for i, r in enumerate(rows)
        for (u, s, v) in [r[:3]]
    ]
    return spark.createDataFrame(
        full, ["user_id", "event_id", "ts", "value", "event_type"]
    )


def test_twa_hand_value(spark):
    # v=10 for 10s, v=20 for 30s, last sample open-ended (dropped):
    # twa = (10*10 + 20*30) / 40 = 17.5
    df = _events(spark, [(1, 0, 10.0), (1, 10, 20.0), (1, 40, 99.0)])
    row = time_weighted_avg(df).collect()[0]
    assert (row.n_events, row.window_ms) == (3, 40000)
    assert row.twa == pytest.approx(17.5)
    assert not row.degenerate


def test_twa_single_event_sentinel(spark):
    df = _events(spark, [(7, 0, 5.0)])
    row = time_weighted_avg(df).collect()[0]
    assert (row.window_ms, row.twa, row.degenerate) == (0, -1.0, True)


def test_twa_groups_independent(spark):
    df = _events(spark, [(1, 0, 10.0), (1, 10, 0.0), (2, 0, 4.0), (2, 5, 0.0)])
    got = {r.user_id: r.twa for r in time_weighted_avg(df).collect()}
    assert got[1] == pytest.approx(10.0)
    assert got[2] == pytest.approx(4.0)


def test_debounce_collapses_bursts(spark):
    # bursts at 0-5-9s then 700s later; gap 600s -> two islands
    df = _events(
        spark,
        [(1, 0, 1.0), (1, 5, 1.0), (1, 9, 1.0), (1, 709, 1.0)],
    )
    out = sorted(
        debounce(df, keys=["user_id", "event_type"], gap_seconds=600).collect(),
        key=lambda r: r.island_id,
    )
    assert [(r.n_collapsed, r.span_ms) for r in out] == [(3, 9000), (1, 0)]
    assert out[0].island_id == 1


def test_debounce_boundary_gap_is_same_island(spark):
    # exactly gap_seconds apart: NOT a new burst (strict > in the rule)
    df = _events(spark, [(1, 0, 1.0), (1, 600, 1.0), (1, 1201, 1.0)])
    out = debounce(df, keys=["user_id", "event_type"], gap_seconds=600).collect()
    assert sorted(r.n_collapsed for r in out) == [1, 2]


def test_debounce_keys_partition(spark):
    df = _events(
        spark,
        [(1, 0, 1.0, "view"), (1, 1, 1.0, "click"), (2, 2, 1.0, "view")],
    )
    out = debounce(df, keys=["user_id", "event_type"], gap_seconds=600).collect()
    assert len(out) == 3  # every (user, type) starts its own island
