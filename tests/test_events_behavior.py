"""Behavioral analytics (operators/events.py): strict ordered funnel,
weekly cohort retention, order-1 Markov transition matrix.  Fixtures
are small enough to verify by hand, including the funnel's
strict-ordering edge cases (out-of-order stages must NOT count;
timestamp ties break by event_id)."""

import datetime as dt

import pytest

from ddaugner_spark.operators import events as evops


def _ev(spark, rows):
    # rows: (event_id, ts_str, user_id, event_type)
    data = [
        (i, dt.datetime.fromisoformat(ts), u, et) for (i, ts, u, et) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def _funnel_map(df):
    return {r["stage"]: r["n_users"] for r in df.collect()}


def test_funnel_strict_order(spark):
    e = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, "2024-01-01T00:00", 1, "signup"),
            (2, "2024-01-01T01:00", 1, "view"),
            (3, "2024-01-01T02:00", 1, "click"),
            (4, "2024-01-01T03:00", 1, "purchase"),
            # user 2: purchase BEFORE click -> stops at view... but a
            # second click+purchase later completes it? no: only click
            # after view counts, purchase must follow that click
            (5, "2024-01-02T00:00", 2, "signup"),
            (6, "2024-01-02T01:00", 2, "purchase"),
            (7, "2024-01-02T02:00", 2, "view"),
            (8, "2024-01-02T03:00", 2, "click"),
            # user 3: view but never signed up -> counts nowhere
            (9, "2024-01-03T00:00", 3, "view"),
        ],
    )
    got = _funnel_map(evops.funnel_counts(e))
    assert got == {"signup": 2, "view": 2, "click": 2, "purchase": 1}


def test_funnel_tie_breaks_by_event_id(spark):
    # same timestamp: view's event_id greater than signup's -> counts;
    # user 2 has view event_id SMALLER than signup's at the same ts -> not
    e = _ev(
        spark,
        [
            (10, "2024-01-01T00:00", 1, "signup"),
            (11, "2024-01-01T00:00", 1, "view"),
            (21, "2024-01-01T00:00", 2, "signup"),
            (20, "2024-01-01T00:00", 2, "view"),
        ],
    )
    got = _funnel_map(evops.funnel_counts(e))
    assert got == {"signup": 2, "view": 1, "click": 0, "purchase": 0}


def test_retention_cohorts(spark):
    e = _ev(
        spark,
        [
            # user 1: first event week of Mon 2024-01-01, active again +2w
            (1, "2024-01-02T10:00", 1, "view"),
            (2, "2024-01-16T10:00", 1, "click"),
            # user 2: same cohort, active only week 0 (two events, one row)
            (3, "2024-01-03T10:00", 2, "view"),
            (4, "2024-01-04T10:00", 2, "view"),
            # user 3: cohort of Mon 2024-01-08
            (5, "2024-01-10T10:00", 3, "view"),
        ],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in evops.retention_cohorts(e).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_markov_transitions(spark):
    e = _ev(
        spark,
        [
            (1, "2024-01-01T00:00", 1, "view"),
            (2, "2024-01-01T01:00", 1, "view"),
            (3, "2024-01-01T02:00", 1, "click"),
            (4, "2024-01-01T00:00", 2, "view"),
            (5, "2024-01-01T01:00", 2, "purchase"),
        ],
    )
    got = {
        (r["cur"], r["nxt"]): (r["cnt"], r["p"])
        for r in evops.markov_transitions(e).collect()
    }
    # from 'view': view->view 1, view->click 1, view->purchase 1 (3 total)
    assert got[("view", "view")] == (1, pytest.approx(round(1 / 3, 6)))
    assert got[("view", "click")] == (1, pytest.approx(round(1 / 3, 6)))
    assert got[("view", "purchase")] == (1, pytest.approx(round(1 / 3, 6)))
    assert len(got) == 3  # click/purchase are terminal in this fixture


def test_seq_pattern_support_matches_python_greedy(spark, sf_dir):
    """Engine support counts == eager per-user greedy subsequence scan
    (greedy-earliest is exact for subsequence existence), over every
    ordered type triple, ties broken by the same (ts, event_id) key."""
    from collections import defaultdict
    from itertools import product

    from ddaugner_spark.operators.events import seq_pattern_support

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["e1"], r["e2"], r["e3"]): r["support"]
        for r in seq_pattern_support(ev).collect()
    }
    hist = defaultdict(list)
    for r in ev.select("user_id", "event_type", "ts", "event_id").collect():
        hist[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    for h in hist.values():
        h.sort()
    types = sorted({t for h in hist.values() for _, _, t in h})
    want = {}
    for pat in product(types, repeat=3):
        n = 0
        for h in hist.values():
            i = 0
            for _, _, t in h:
                if t == pat[i]:
                    i += 1
                    if i == 3:
                        break
            n += i == 3
        if n:
            want[pat] = n
    assert got and got == want


def _evv(spark, rows):
    # rows: (event_id, ts_str, user_id, event_type, value)
    data = [
        (i, dt.datetime.fromisoformat(ts), u, et, v)
        for (i, ts, u, et, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double",
    )


def test_seasonal_decompose_identity_and_windows(spark):
    """daily = trend + seasonal + remainder exactly on full-window
    rows; edge rows (incomplete 7-day MA) stay NULL; a constant series
    decomposes to trend = the constant, seasonal = remainder = 0."""
    rows = []
    eid = 0
    for day in range(1, 15):  # 14 days
        rows.append(
            (eid, f"2024-01-{day:02d}T12:00:00", 1, "view", 10.0)
        )
        eid += 1
    out = evops.seasonal_decompose(_evv(spark, rows)).collect()
    assert len(out) == 14
    full = [r for r in out if r["trend"] is not None]
    edge = [r for r in out if r["trend"] is None]
    assert len(full) == 8 and len(edge) == 6  # days 4..11 have full MAs
    for r in full:
        assert r["trend"] == 10.0
        assert r["seasonal"] == 0.0
        assert r["remainder"] == 0.0
        assert r["seasonal"] is not None
    for r in edge:
        assert r["seasonal"] is None and r["remainder"] is None


def test_seasonal_decompose_weekly_pattern(spark):
    """A pure weekly pattern rides entirely in the seasonal component:
    value = 100 + 20·[monday].  Trend (7-day MA) is flat = 100 + 20/7;
    seasonal picks up the per-dow deviation; remainder 0."""
    rows = []
    eid = 0
    for day in range(1, 29):  # 4 weeks, 2024-01-01 is a Monday
        v = 120.0 if (day - 1) % 7 == 0 else 100.0
        rows.append((eid, f"2024-01-{day:02d}T08:00:00", 1, "view", v))
        eid += 1
    out = {
        r["d"]: r
        for r in evops.seasonal_decompose(_evv(spark, rows)).collect()
        if r["trend"] is not None
    }
    trend = round(100 + 20 / 7, 6)
    for d, r in out.items():
        assert r["trend"] == trend, (d, r)
        is_monday = (d.day - 1) % 7 == 0
        want_season = round(120 - (100 + 20 / 7), 6) if is_monday else round(
            100 - (100 + 20 / 7), 6
        )
        assert abs(r["seasonal"] - want_season) < 1e-6, (d, r)
        assert abs(r["remainder"]) < 1e-6, (d, r)
        assert abs(r["daily"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 2e-6


def test_mann_kendall_monotone_and_ties(spark):
    """Strictly increasing series: S = n(n−1)/2, no ties, z matches the
    closed form; a constant series: S = 0, Var = 0-adjacent tie term,
    z = 0."""
    import math

    rows = []
    eid = 0
    for day in range(1, 11):  # strictly increasing
        rows.append((eid, f"2024-01-{day:02d}T01:00:00", 1, "up", float(day)))
        eid += 1
    for day in range(1, 11):  # constant (all ties)
        rows.append((eid, f"2024-01-{day:02d}T01:00:00", 1, "flat", 5.0))
        eid += 1
    out = {
        r["event_type"]: r
        for r in __import__("ddaugner_spark.operators.stats", fromlist=["s"])
        .mann_kendall(_evv(spark, rows))
        .collect()
    }
    n = 10
    up = out["up"]
    assert up["n"] == n and up["s_stat"] == n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert up["var_s"] == round(var, 6)
    assert up["z"] == round((up["s_stat"] - 1) / math.sqrt(var), 6)
    flat = out["flat"]
    assert flat["s_stat"] == 0 and flat["z"] == 0.0
    # all 10 values tie -> tie term equals the n term -> Var = 0
    assert flat["var_s"] == 0.0


def test_rolling_active_users_hand_fixture(spark):
    """10 observed days, users overlapping across a 7-day window; only
    buckets with a full trailing window inside the span are emitted."""
    rows = []
    eid = 0
    for day in range(1, 11):
        # user = day mod 3 -> 3 users cycling; plus user 99 on day 1 only
        rows.append((eid, f"2024-01-{day:02d}T10:00:00", day % 3, "view", 1.0))
        eid += 1
    rows.append((eid, "2024-01-01T11:00:00", 99, "view", 1.0))
    out = {
        r["d"]: r["active_users"]
        for r in evops.rolling_active_users(_evv(spark, rows)).collect()
    }
    # span 01..10 -> buckets 07..10
    assert sorted(out) == [f"2024-01-{d:02d}" for d in (7, 8, 9, 10)]
    # window 01-07 contains users {0,1,2,99}; 02-08..04-10 contain {0,1,2}
    assert out["2024-01-07"] == 4
    assert out["2024-01-08"] == 3
    assert out["2024-01-10"] == 3


def test_kruskal_wallis_scipy_free_replay(spark):
    """Closed-form checks: identical groups → H = 0; two cleanly
    separated groups of 5 (no ties) → H equals the textbook value; the
    scipy formula replayed in python on the same cents-scaled data."""
    from ddaugner_spark.operators import stats as st

    rows = []
    eid = 0
    # group A: values 1..5, group B: 11..15 (fully separated, no ties)
    for i in range(5):
        rows.append((eid, f"2024-01-{i+1:02d}T01:00:00", 1, "A", float(i + 1)))
        eid += 1
        rows.append(
            (eid, f"2024-01-{i+1:02d}T02:00:00", 1, "B", float(i + 11))
        )
        eid += 1
    out = {
        r["event_type"]: r
        for r in st.kruskal_wallis(_evv(spark, rows)).collect()
    }
    # ranks: A holds 1..5 (sum 15), B holds 6..10 (sum 40); doubled
    assert out["A"]["rank_sum2"] == 30 and out["B"]["rank_sum2"] == 80
    n = 10
    h = 12 / (n * (n + 1)) * (15**2 / 5 + 40**2 / 5) - 3 * (n + 1)
    assert abs(out["A"]["h"] - round(h, 6)) <= 1e-6
    assert out["A"]["h_corrected"] == out["A"]["h"]  # no ties

    # all-identical values: H = 0 and the tie guard avoids div-by-zero
    rows2 = [
        (i, f"2024-01-{(i % 9) + 1:02d}T01:00:00", 1, "AB"[i % 2], 7.0)
        for i in range(12)
    ]
    out2 = st.kruskal_wallis(_evv(spark, rows2)).collect()
    assert all(r["h"] == 0.0 and r["h_corrected"] == 0.0 for r in out2)


def test_sprt_crossing_and_llr_arithmetic(spark):
    """A stream converting at exactly p1 = 4% crosses the H1 boundary;
    per-day llr equals the closed form; the decision labels flip at
    the Wald thresholds."""
    import math

    rows = []
    eid = 0
    for day in range(1, 21):
        for i in range(100):  # 100 views/day
            rows.append(
                (eid, f"2024-01-{day:02d}T01:{i % 60:02d}:00", i, "view", 1.0)
            )
            eid += 1
        for i in range(4):  # 4 purchases/day = p1 exactly
            rows.append(
                (eid, f"2024-01-{day:02d}T02:{i:02d}:00", i, "purchase", 1.0)
            )
            eid += 1
    out = sorted(
        (r["d"], r["n_trials"], r["n_success"], r["llr"], r["decision"])
        for r in evops.sprt_daily(_evv(spark, rows)).collect()
    )
    c1 = math.log(0.04 / 0.02)
    c0 = math.log(0.96 / 0.98)
    upper = math.log(0.95 / 0.05)
    crossed = False
    for day, (d, nt, ns, llr, dec) in enumerate(out, start=1):
        assert nt == 100 * day and ns == 4 * day
        want = round(ns * c1 + (nt - ns) * c0, 6)
        assert llr == want, (d, llr, want)
        if ns * c1 + (nt - ns) * c0 >= upper:
            crossed = True
            assert dec == "accept_h1", d
        else:
            assert dec == "continue", d
    assert crossed  # 20 days at true p1 is plenty to cross


def test_page_hinkley_step_change_alarms(spark):
    """A level shift from mean 1.00 to mean 61.00 drives ph past
    λ = 50; the pre-shift segment never alarms; per-day x, running
    mean, m_t and ph replay the recurrence by hand."""
    rows = []
    eid = 0
    for day in range(1, 11):  # 10 quiet days at value 1.00
        for i in range(5):
            rows.append((eid, f"2024-01-{day:02d}T01:{i:02d}:00", i, "e", 1.0))
            eid += 1
    for day in range(11, 21):  # 10 shifted days at value 61.00
        for i in range(5):
            rows.append((eid, f"2024-01-{day:02d}T01:{i:02d}:00", i, "e", 61.0))
            eid += 1
    out = sorted(
        (r["d"], r["x"], r["run_mean"], r["m_t"], r["ph"], r["alarm"])
        for r in evops.page_hinkley(_evv(spark, rows)).collect()
    )
    assert len(out) == 20
    # hand replay
    cum_c, cum_n, m, mmin = 0, 0, 0.0, None
    for idx, (d, x, rm, m_t, ph, alarm) in enumerate(out, start=1):
        val = 1.0 if idx <= 10 else 61.0
        cum_c += int(round(val * 100)) * 5
        cum_n += 5
        want_rm = cum_c / 100.0 / cum_n
        assert x == round(val, 6) and rm == round(want_rm, 6)
        m += val - want_rm - 0.5
        mmin = m if mmin is None else min(mmin, m)
        assert m_t == round(m, 6) and ph == round(m - mmin, 6)
        assert alarm == ((m - mmin) > 50.0), d
    assert not any(a for (_, _, _, _, _, a) in out[:10])
    assert out[-1][5]  # shifted regime ends in alarm
