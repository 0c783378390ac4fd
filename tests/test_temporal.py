"""AS-OF join (operators/temporal.py): union+window formulation vs a
hand-built expectation, including LEFT semantics (unmatched rows keep
NULLs), the <= boundary (equal timestamps match), and the (key, ts)
tiebreak."""

import datetime as dt

import pyspark.sql.functions as F

from ddaugner_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), 100, 1.0),   # after v1
            (1, _ts("2024-01-01T00:20:00"), 101, 2.0),   # equal ts to v2 -> matches v2
            (1, _ts("2024-01-01T00:05:00"), 102, 3.0),   # before any view -> NULL
            (2, _ts("2024-01-01T09:00:00"), 103, 4.0),   # other key, no views -> NULL
        ],
        "user_id long, ts timestamp, event_id long, click_value double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:08:00"), 10, 11.0),   # v1
            (1, _ts("2024-01-01T00:20:00"), 11, 22.0),   # v2a (tiebreak loser)
            (1, _ts("2024-01-01T00:20:00"), 12, 33.0),   # v2b (max event_id wins)
        ],
        "user_id long, ts timestamp, event_id long, view_value double",
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_view_value"])
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_cols=["view_value"], tiebreak="event_id",
        ).collect()
    }
    assert out[100] == (_ts("2024-01-01T00:08:00"), 11.0)
    assert out[101] == (_ts("2024-01-01T00:20:00"), 33.0)  # <= boundary + tiebreak
    assert out[102] == (None, None)                        # LEFT semantics
    assert out[103] == (None, None)
    assert len(out) == 4


def test_asof_single_shuffle_plan(spark):
    """The formulation must plan exactly one exchange (the window) — no
    join operator at all."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:10:00"), 1, 1.0)],
        "user_id long, ts timestamp, event_id long, click_value double",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:08:00"), 2, 9.0)],
        "user_id long, ts timestamp, event_id long, view_value double",
    )
    out = asof_join(left, right, "user_id", "ts", ["view_value"], "event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_range_join_bucketing_complete(spark):
    """Bucketed range join == brute-force filter on hand-built data,
    including pairs whose gap straddles a bucket boundary (the fan-out's
    reason to exist) and exact-boundary gaps (<=)."""
    from ddaugner_spark.operators.temporal import range_join

    base = dt.datetime(2024, 1, 1)
    # delta = 60s buckets; gaps: 0, 59, 60 (boundary), 61 (out),
    # 119 straddling two buckets, plus another key
    left = spark.createDataFrame(
        [(1, base, 100), (2, base, 200)],
        "user_id long, ts timestamp, event_id long",
    )
    rows = [
        (1, base, 10),
        (1, base + dt.timedelta(seconds=59), 11),
        (1, base + dt.timedelta(seconds=60), 12),
        (1, base + dt.timedelta(seconds=61), 13),
        (1, base - dt.timedelta(seconds=59), 14),
        (1, base - dt.timedelta(seconds=61), 15),
        (2, base + dt.timedelta(seconds=30), 16),
    ]
    right = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    out = {
        (r["user_id"], r["l_event_id"], r["r_event_id"]): r["gap_seconds"]
        for r in range_join(
            left, right, key="user_id", ts="ts", delta_seconds=60,
            left_cols=["event_id"], right_cols=["event_id"],
        ).collect()
    }
    want = {}
    for uid, ts, rid in rows:
        for luid, lts, lid in [(1, base, 100), (2, base, 200)]:
            if uid == luid and abs((ts - lts).total_seconds()) <= 60:
                want[(luid, lid, rid)] = (ts - lts).total_seconds()
    assert out == want
    assert (1, 100, 12) in out and (1, 100, 13) not in out


def test_hypertable_reaggregation_property(spark, sf_dir):
    """day-from-hourly == day-from-raw (count/sum are decomposable); the
    continuous-aggregate contract that lets every coarser granularity
    derive without rescanning raw events."""
    import pyspark.sql.functions as F
    from ddaugner_spark.operators.temporal import (
        coarsen_rollup,
        hypertable_rollup,
        time_bucket,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = hypertable_rollup(e, "ts", "value", 3600, ["event_type"])
    via_hourly = {
        (r["bucket_ts"], r["event_type"]): (r["n"], round(r["sum_v"], 4))
        for r in coarsen_rollup(hourly, 86400, ["event_type"]).collect()
    }
    direct = {
        (r["bucket_ts"], r["event_type"]): (r["n"], round(r["sum_v"], 4))
        for r in hypertable_rollup(e, "ts", "value", 86400, ["event_type"]).collect()
    }
    assert via_hourly == direct and direct


def test_asof_null_right_value_from_matched_row(spark):
    """The matched right row's NULL must be returned as-is — not spliced
    with an older row's non-NULL value (DuckDB ASOF semantics; was a
    latent per-column last(ignorenulls) bug, ADVICE r2)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:30:00"), 100, 1.0)],
        "user_id long, ts timestamp, event_id long, click_value double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), 10, 11.0),  # older, non-NULL
            (1, _ts("2024-01-01T00:20:00"), 11, None),  # matched row, NULL value
        ],
        "user_id long, ts timestamp, event_id long, view_value double",
    )
    row = asof_join(
        left, right, "user_id", "ts", ["view_value"], "event_id"
    ).collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01T00:20:00")
    assert row["asof_view_value"] is None  # NOT 11.0


def test_scd2_collapses_and_stitches(spark):
    """4 captures with states A,A,B,B must yield exactly 2 versions with
    back-to-back validity; a single-state history yields 1 open row;
    NULL attr values compare equal to NULL (no phantom version)."""
    from ddaugner_spark.operators.temporal import scd2

    caps = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:00"), "A", 0),
            ("u1", _ts("2024-01-01T00:01:00"), "A", 0),
            ("u1", _ts("2024-01-01T00:02:00"), "B", 0),
            ("u1", _ts("2024-01-01T00:03:00"), "B", 0),
            ("u2", _ts("2024-01-01T00:00:00"), None, 0),
            ("u2", _ts("2024-01-01T00:01:00"), None, 0),
        ],
        "url string, ts timestamp, attr string, tb long",
    )
    rows = {
        (r["url"], r["version"]): r
        for r in scd2(caps, "url", "ts", ["attr"], tiebreak="tb").collect()
    }
    assert set(rows) == {("u1", 1), ("u1", 2), ("u2", 1)}
    v1, v2 = rows[("u1", 1)], rows[("u1", 2)]
    assert v1["attr"] == "A" and not v1["is_current"]
    assert v1["valid_to"] == v2["valid_from"] == _ts("2024-01-01T00:02:00")
    assert v2["attr"] == "B" and v2["is_current"] and v2["valid_to"] is None
    u2 = rows[("u2", 1)]
    assert u2["attr"] is None and u2["is_current"]


def test_scd2_single_shuffle_plan(spark):
    """Both window passes share the key partitioning — exactly one
    exchange in the plan."""
    from ddaugner_spark.operators.temporal import scd2

    caps = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), "A", 0)],
        "url string, ts timestamp, attr string, tb long",
    )
    plan = (
        scd2(caps, "url", "ts", ["attr"], tiebreak="tb")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_merge_intervals_swallowed_successor(spark):
    """A long first interval swallowing two later ones must produce ONE
    island even though interval 3 does not overlap interval 2 — the
    lag(end) formulation fails exactly here; running max is required."""
    from ddaugner_spark.operators.temporal import merge_intervals

    iv = spark.createDataFrame(
        [
            (1, 0, 100),   # swallows both
            (1, 10, 20),
            (1, 30, 40),
            (1, 150, 160), # separate island
            (2, 0, 1),
        ],
        "k long, s long, e long",
    )
    out = {
        (r["k"], r["island"]): (r["span_start"], r["span_end"], r["n_intervals"])
        for r in merge_intervals(iv, "k", "s", "e").collect()
    }
    assert out[(1, 1)] == (0, 100, 3)
    assert out[(1, 2)] == (150, 160, 1)
    assert out[(2, 1)] == (0, 1, 1)
    assert len(out) == 3


def test_locf_fills_and_keeps_leading_nulls(spark):
    from ddaugner_spark.operators.temporal import locf

    df = spark.createDataFrame(
        [
            (1, 1, None),
            (1, 2, 5.0),
            (1, 3, None),
            (1, 4, None),
            (1, 5, 7.0),
            (2, 1, None),
        ],
        "k long, seq long, v double",
    )
    out = {
        (r["k"], r["seq"]): r["v_filled"]
        for r in locf(df, "k", "seq", "v", tiebreak="seq").collect()
    }
    assert out[(1, 1)] is None          # leading gap stays
    assert out[(1, 3)] == 5.0 and out[(1, 4)] == 5.0
    assert out[(1, 5)] == 7.0
    assert out[(2, 1)] is None


def test_interpolate_grid_straight_line(spark):
    from ddaugner_spark.operators.temporal import interpolate_grid

    # series s: obs at 0s = 1.00 and 7200s = 3.00 -> ticks 0/3600/7200
    obs = spark.createDataFrame(
        [("s", 0, 100), ("s", 7200, 300)], "series string, epoch long, vc long"
    )
    got = {
        r.tick: (r.value, r.kind)
        for r in interpolate_grid(obs, tick_s=3600).collect()
    }
    assert got == {0: (1.0, "exact"), 3600: (2.0, "interp"), 7200: (3.0, "exact")}


def test_interpolate_grid_no_extrapolation_and_offgrid_obs(spark):
    from ddaugner_spark.operators.temporal import interpolate_grid

    # obs off-grid at 1800 and 5400: only tick 3600 falls inside;
    # value = (100*(5400-3600) + 200*(3600-1800)) / (100*(5400-1800)) = 1.5
    obs = spark.createDataFrame(
        [("s", 1800, 100), ("s", 5400, 200)], "series string, epoch long, vc long"
    )
    rows = interpolate_grid(obs, tick_s=3600).collect()
    assert [(r.tick, r.value, r.kind) for r in rows] == [(3600, 1.5, "interp")]


def test_interpolate_grid_single_obs_series(spark):
    from ddaugner_spark.operators.temporal import interpolate_grid

    # single on-grid obs -> exactly that tick, 'exact'; single off-grid
    # obs -> no tick inside [ceil, floor] window -> empty
    on = spark.createDataFrame([("a", 3600, 250)], "series string, epoch long, vc long")
    off = spark.createDataFrame([("b", 3000, 250)], "series string, epoch long, vc long")
    rows = interpolate_grid(on.union(off), tick_s=3600).collect()
    assert [(r.series, r.tick, r.value, r.kind) for r in rows] == [
        ("a", 3600, 2.5, "exact")
    ]
