"""Nelson–Aalen cumulative hazard (operators/events.py nelson_aalen),
power-law MLE (operators/graph.py powerlaw_alpha), cumulative-gains
lift table (operators/traindata.py lift_table) — pinned against
hand-computed hazards on a tiny cohort, the closed-form Clauset MLE on
a constructed degree sequence, and a fully hand-folded lift table.
"""

import datetime
import math

import pytest

from ddaugner_spark.operators.events import nelson_aalen
from ddaugner_spark.operators.graph import powerlaw_alpha
from ddaugner_spark.operators.traindata import lift_table


def _ev(spark, rows):
    # (user, hour, type, value)
    return spark.createDataFrame(
        [
            (
                i,
                datetime.datetime(2024, 1, 1, 0) + datetime.timedelta(hours=h),
                u,
                t,
                float(v),
                "{}",
            )
            for i, (u, h, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )


def test_nelson_aalen_hand_cohort(spark):
    # u1 dies at t=2, u2 dies at t=5, u3 censored at t=5
    rows = [
        ("u1", 0, "view", 1), ("u1", 2, "purchase", 500),
        ("u2", 0, "view", 1), ("u2", 5, "purchase", 500),
        ("u3", 0, "view", 1), ("u3", 5, "view", 1),
    ]
    got = {r.t_h: r for r in nelson_aalen(_ev(spark, rows)).collect()}
    assert set(got) == {2, 5}
    # t=2: n_risk 3, d 1 -> H = 1/3; t=5: n_risk 2, d 1, c 1 -> H = 1/3 + 1/2
    assert got[2].n_risk == 3 and got[2].d == 1
    assert got[2].cum_hazard == pytest.approx(1 / 3, abs=1e-6)
    assert got[5].n_risk == 2 and got[5].d == 1 and got[5].c == 1
    assert got[5].cum_hazard == pytest.approx(1 / 3 + 1 / 2, abs=1e-6)
    assert got[5].se == pytest.approx(
        math.sqrt(1 / 9 + 1 / 4), abs=1e-6
    )


def test_nelson_aalen_monotone_and_exceeds_neglog_km(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = sorted(nelson_aalen(ev).collect(), key=lambda r: r.t_h)
    hazards = [r.cum_hazard for r in rows]
    assert hazards == sorted(hazards)
    from ddaugner_spark.operators.events import kaplan_meier

    km = {r.t_h: r.survival for r in kaplan_meier(ev).collect()}
    # classic inequality: H_NA(t) <= -ln(S_KM(t)) wherever S > 0
    for r in rows:
        if km[r.t_h] > 0:
            assert r.cum_hazard <= -math.log(km[r.t_h]) + 1e-9


def test_powerlaw_closed_form(spark):
    # degree sequence built from a star forest: hubs of degree 2,4,8
    edges = []
    for hub, d in (("h2", 2), ("h4", 4), ("h8", 8)):
        edges += [(hub, f"{hub}_leaf{i}") for i in range(d)]
    df = spark.createDataFrame(edges, "a string, b string")
    got = powerlaw_alpha(df, d_min=2).collect()[0]
    # tail = the three hubs (leaves have degree 1 < d_min)
    assert got.n_tail == 3 and got.d_min == 2
    # quantized-ln replay
    lq = sum(round(math.log(d / 2.0) * 1e6) for d in (2, 4, 8))
    alpha = 1.0 + 3 / (lq / 1e6)
    assert got.alpha == pytest.approx(alpha, abs=1e-6)
    assert got.se == pytest.approx((alpha - 1) / math.sqrt(3), abs=1e-6)


def test_lift_hand_folded(spark):
    # bins 9 (cap 450+) and 0 (cap < 50): top decile captures both
    # positives in a corpus where 2/6 docs are positive
    rows = [(470, "en"), (460, "en"), (30, "de"), (20, "de"), (10, "de"),
            (5, "de")]
    docs = spark.createDataFrame(
        [(i, c, l) for i, (c, l) in enumerate(rows)],
        "doc_id long, n_chars long, lang string",
    )
    got = {r.bin: r for r in lift_table(docs, n_bins=10).collect()}
    assert got[9].cum_n == 2 and got[9].cum_pos == 2
    assert got[9].gain == 1.0
    # lift@top = (2*6)/(2*2) = 3.0 (= 1/base-rate since gain is 1)
    assert got[9].lift == pytest.approx(3.0, abs=1e-6)
    assert got[0].cum_n == 6 and got[0].gain == 1.0
    assert got[0].lift == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------ Shapley

def test_shapley_efficiency_and_hand_values(spark):
    from ddaugner_spark.operators.events import shapley_attribution

    # users: {click} converts 1/2; {click,view} converts 1/1;
    # {view} converts 0/1; nobody touches signup
    rows = []
    rows += [("u1", "click", 0.0), ("u1", "purchase", 10.0)]
    rows += [("u2", "click", 0.0)]
    rows += [("u3", "click", 0.0), ("u3", "view", 0.0),
             ("u3", "purchase", 10.0)]
    rows += [("u4", "view", 0.0)]
    df = spark.createDataFrame(
        [
            (i, __import__("datetime").datetime(2024, 1, 1), u, t, v, "{}")
            for i, (u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = {
        r.channel: r
        for r in shapley_attribution(
            df, conv_type="purchase",
            channels=("click", "view", "signup"), min_value=0.0,
        ).collect()
    }
    assert got["click"].n_exposed == 3 and got["view"].n_exposed == 2
    assert got["signup"].n_exposed == 0
    # eager Shapley replay over v(S) = conv_rate of the EXACT set
    import math
    from itertools import combinations

    v = {"100": 0.5, "110": 1.0, "010": 0.0}

    def val(s):
        return v.get("".join("1" if i in s else "0" for i in range(3)), 0.0)

    for ci, name in enumerate(("click", "view", "signup")):
        phi = 0.0
        others = [i for i in range(3) if i != ci]
        for r in range(3):
            for sub in combinations(others, r):
                w = math.factorial(r) * math.factorial(2 - r) / 6
                phi += round(
                    1e9 * w * (val(set(sub) | {ci}) - val(set(sub)))
                ) / 1e9
        assert got[name].shapley == pytest.approx(phi, abs=1e-6)
    # efficiency: sum of credits == v(full) - v(empty) = 0 - 0 here
    # (the full set {c,v,s} never occurs -> v = 0, and v(∅) = 0), so
    # check the identity on the quantized values instead
    total = sum(r.shapley for r in got.values())
    assert total == pytest.approx(val({0, 1, 2}) - val(set()), abs=1e-5)


# --------------------------------------------------------------- SAX

def test_sax_symbols_hand_series(spark):
    import datetime

    from ddaugner_spark.operators.events import sax_symbols

    # one event per day, type 'm': low low low, mid mid mid, hi hi hi
    vals = [1.0] * 3 + [5.0] * 3 + [9.0] * 3
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
         "u", "m", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = {r.seg: r for r in sax_symbols(df, window_days=3).collect()}
    assert [got[s].paa_q for s in (0, 1, 2)] == [100000, 500000, 900000]
    # z over (1,5,9)-shaped segments: (x-5)/4 -> -1, 0, 1
    assert got[0].z == pytest.approx(-1.0, abs=1e-6)
    assert got[1].z == pytest.approx(0.0, abs=1e-6)
    assert got[2].z == pytest.approx(1.0, abs=1e-6)
    # symbols: -1 < -0.6745 -> 'a'; 0 -> 'c' (z < 0 is 'b', 0 is not);
    # 1 >= 0.6745 -> 'd'
    assert (got[0].symbol, got[1].symbol, got[2].symbol) == ("a", "c", "d")


def test_sax_flat_series_neutral(spark):
    import datetime

    from ddaugner_spark.operators.events import sax_symbols

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
         "u", "m", 3.0, "{}")
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    out = sax_symbols(df, window_days=3).collect()
    assert all(r.z == 0.0 and r.symbol == "c" for r in out)


# -------------------------------------------------------------- PACF

def test_pacf_matches_statsmodels_style_dl(spark):
    """Durbin–Levinson replay on a constructed ACF: feed known r's and
    compare against a pure-Python DL recursion (the statsmodels
    pacf(method='ld') contract)."""
    from ddaugner_spark.operators.temporal import pacf_from_acf

    rs = [0.8, 0.55, 0.3, 0.12, 0.02, -0.05]
    acf = spark.createDataFrame(
        [(k + 1, 10, r) for k, r in enumerate(rs)],
        "lag long, n_buckets long, r double",
    )
    got = {r.lag: r.pacf for r in pacf_from_acf(acf, max_lag=6).collect()}

    phi = {1: {1: rs[0]}}
    for k in range(2, 7):
        num = rs[k - 1] - sum(
            phi[k - 1][j] * rs[k - j - 1] for j in range(1, k)
        )
        den = 1.0 - sum(phi[k - 1][j] * rs[j - 1] for j in range(1, k))
        pkk = num / den if den != 0 else 0.0
        phi[k] = {k: pkk}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - pkk * phi[k - 1][k - j]
    for k in range(1, 7):
        assert got[k] == pytest.approx(round(phi[k][k], 6), abs=1e-6)
    # AR(1)-ish input: lag-1 PACF equals r1; deeper lags shrink
    assert got[1] == pytest.approx(0.8, abs=1e-9)
    assert abs(got[6]) < abs(got[1])


def test_pacf_white_noise_zeroish(spark):
    from ddaugner_spark.operators.temporal import pacf_from_acf

    acf = spark.createDataFrame(
        [(k, 10, 0.0) for k in range(1, 7)],
        "lag long, n_buckets long, r double",
    )
    out = pacf_from_acf(acf, max_lag=6).collect()
    assert all(r.pacf == 0.0 for r in out)


# ----------------------------------------------------- Ljung-Box/Theil

def test_ljung_box_closed_form(spark):
    from ddaugner_spark.operators.temporal import ljung_box

    rs = [0.5, -0.2, 0.1]
    acf = spark.createDataFrame(
        [(k + 1, 50, r) for k, r in enumerate(rs)],
        "lag long, n_buckets long, r double",
    )
    got = ljung_box(acf).collect()[0]
    n = 50
    want = sum(round(1e9 * r * r / (n - k - 1)) for k, r in enumerate(rs))
    assert (got.n, got.df) == (50, 3)
    assert got.q_stat == pytest.approx(n * (n + 2) * want / 1e9, abs=1e-5)


def test_theil_decomposition_identity(spark):
    import math

    from ddaugner_spark.operators.stats import theil_decomposition

    rows = (
        [("a", 100)] * 3 + [("a", 400)]
        + [("b", 50)] * 4
        + [("c", 900), ("c", 100)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r.g: r for r in theil_decomposition(df, "g", "x").collect()}
    tot = out["__total__"]
    # decomposition identity: T_total = T_between + Σ share·T_within
    parts = tot.contrib + sum(
        out[g].contrib for g in ("a", "b", "c")
    )
    assert tot.t_within == pytest.approx(parts, abs=5e-6)
    # equal group ('b') has zero within-inequality
    assert out["b"].t_within == 0.0
    # eager replay of the overall Theil T on the raw values
    xs = [x for _, x in rows]
    mu = sum(xs) / len(xs)
    t_eager = sum((x / sum(xs)) * math.log(x / mu) for x in xs)
    assert tot.t_within == pytest.approx(t_eager, abs=5e-6)
    # shares sum to 1
    assert sum(out[g].share for g in ("a", "b", "c")) == pytest.approx(
        1.0, abs=1e-6
    )


# ------------------------------------------------- Lorenz / spam mass

def test_lorenz_hand_deciles(spark, tmp_path):
    from ddaugner_spark.operators.stats import lorenz_deciles

    # distinct values 1..20: decile d cuts exactly at value 2d
    rows = [(v,) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "v long")
    got = {
        r.decile: r
        for r in lorenz_deciles(
            df, "v", stage_dir=str(tmp_path / "lz")
        ).collect()
    }
    total = sum(range(1, 21))
    for d in range(1, 11):
        assert got[d].cutoff == 2 * d and got[d].cum_rows == 2 * d
        want = sum(range(1, 2 * d + 1)) / total
        assert got[d].mass_share == pytest.approx(want, abs=1e-6)
    # Lorenz properties on exact quantiles: monotone, below diagonal
    shares = [got[d].mass_share for d in range(1, 11)]
    assert shares == sorted(shares)
    for d in range(1, 10):
        assert got[d].mass_share <= d / 10 + 1e-9
    assert got[10].mass_share == 1.0


def test_spam_mass_flags_unendorsed_rank(spark, sf_dir):
    import importlib

    m = importlib.import_module("__spark_entry__")
    out = m.queries()["q_spam_mass"](spark, str(sf_dir)).collect()
    assert len(out) > 0
    for r in out:
        # <= 1 always; NEGATIVE is legitimate for trusted pages (their
        # personalized rank exceeds their global rank — Gyöngyi §4)
        assert r.spam_mass <= 1.0 + 1e-9
        # identity on the rounded inputs
        if r.pr > 0:
            assert r.spam_mass == pytest.approx(
                round((r.pr - r.tr) / r.pr, 6), abs=1e-6
            )
    # seeds ('hash…' surfaces) hold trusted rank: their spam mass must
    # be below the max
    seeded = [r for r in out if r.entity.startswith("hash")]
    if seeded:
        mx = max(r.spam_mass for r in out)
        assert min(r.spam_mass for r in seeded) < mx


# -------------------------------------------------------------- Hurst

def _hurst_events(spark, values):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
         "u", "m", float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )


def test_hurst_trending_beats_alternating(spark):
    """A persistent (monotone) series must score a higher H than an
    anti-persistent (alternating) one — the discriminating property of
    R/S analysis (H > 0.5 trend, H < 0.5 mean-reversion)."""
    from ddaugner_spark.operators.temporal import hurst_rs

    trend = [float(10 + 3 * i) for i in range(30)]
    alt = [10.0 + (5.0 if i % 2 == 0 else -5.0) for i in range(30)]
    h_trend = hurst_rs(_hurst_events(spark, trend)).collect()[0]
    h_alt = hurst_rs(_hurst_events(spark, alt)).collect()[0]
    assert h_trend.n_sizes == 4 and h_trend.n_windows > 0
    assert h_trend.hurst > 0.9            # near-1 for a straight line
    assert h_alt.hurst < 0.35             # strongly anti-persistent
    assert h_trend.hurst > h_alt.hurst


def test_hurst_constant_windows_dropped(spark):
    from ddaugner_spark.operators.temporal import hurst_rs

    got = hurst_rs(_hurst_events(spark, [7.0] * 30)).collect()[0]
    # every window constant -> D = 0 everywhere -> no points, slope 0
    assert got.n_windows == 0 and got.hurst == 0.0


# ------------------------------------------------------------ Croston

def test_croston_hand_recursion(spark):
    from ddaugner_spark.operators.events import croston_forecast

    # demand days at t=1 (2 units) and t=4 (4 units) over 6 days
    rows = []
    mk = lambda day, n: [(day, "purchase", 300.0)] * n
    sched = {1: 2, 4: 4}
    for day in range(6):
        rows += mk(day, sched.get(day, 0))
        rows += [(day, "view", 1.0)]  # keeps the spine spanning 0..5
    ev = spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(days=day), "u", t, v, "{}")
            for i, (day, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = {
        r.d: r
        for r in croston_forecast(
            ev, demand_type="purchase", min_value=200.0
        ).collect()
    }
    days = sorted(got)
    # day0: cold start
    assert got[days[0]].forecast == 0.0 and got[days[0]].z == 0.0
    # day1: first demand 2 after interval 2 (q counts day0 and day1)
    assert got[days[1]].demand == 2
    assert got[days[1]].z == 2.0 and got[days[1]].p == 2.0
    assert got[days[1]].forecast == pytest.approx(1.0, abs=1e-6)
    # days 2-3: state frozen
    assert got[days[3]].z == 2.0 and got[days[3]].p == 2.0
    # day4: demand 4 after interval 3 -> z = .5·4+.5·2 = 3, p = .5·3+.5·2 = 2.5
    assert got[days[4]].z == 3.0 and got[days[4]].p == 2.5
    assert got[days[4]].forecast == pytest.approx(1.2, abs=1e-6)
    # day5: frozen again
    assert got[days[5]].forecast == pytest.approx(1.2, abs=1e-6)


def test_croston_no_demand_all_zero(spark):
    from ddaugner_spark.operators.events import croston_forecast

    ev = _hurst_events(spark, [1.0] * 5)  # views only, no purchases
    out = croston_forecast(ev, demand_type="purchase").collect()
    assert len(out) == 5
    assert all(r.forecast == 0.0 and r.z == 0.0 for r in out)


# -------------------------------------------- AR(2) / capture-recapture

def test_ar2_recovers_known_process_acf(spark):
    from ddaugner_spark.operators.temporal import yule_walker_ar2

    # theoretical ACF of AR(2) with phi1=.5, phi2=.3:
    # r1 = phi1/(1-phi2) = 5/7; r2 = phi1·r1 + phi2
    phi1, phi2 = 0.5, 0.3
    r1 = phi1 / (1 - phi2)
    r2 = phi1 * r1 + phi2
    acf = spark.createDataFrame(
        [(1, 100, round(r1, 6)), (2, 100, round(r2, 6))],
        "lag long, n_buckets long, r double",
    )
    got = yule_walker_ar2(acf).collect()[0]
    assert got.phi1 == pytest.approx(phi1, abs=1e-4)
    assert got.phi2 == pytest.approx(phi2, abs=1e-4)
    assert got.resid_var_ratio == pytest.approx(
        1 - got.phi1 * round(r1, 6) - got.phi2 * round(r2, 6), abs=1e-5
    )


def test_capture_recapture_near_truth(spark, sf_dir):
    from ddaugner_spark.operators.crawl import capture_recapture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = capture_recapture(docs).collect()[0]
    # ~50% samples of 500 docs; Chapman estimate within 20% of truth
    assert 0.4 * got.true_n < got.n1 < 0.6 * got.true_n
    assert abs(got.n_hat - got.true_n) < 0.2 * got.true_n
    # identity on the counts
    assert got.n_hat == pytest.approx(
        (got.n1 + 1) * (got.n2 + 1) / (got.overlap + 1) - 1, abs=1e-5
    )


# ---------------------------------------------------------------- RBO

def test_rbo_identical_and_disjoint(spark):
    from ddaugner_spark.operators.retrieval import rbo_truncated

    a = spark.createDataFrame(
        [(f"n{i}", float(100 - i)) for i in range(20)], "node string, s double"
    )
    # identical rankings -> truncated RBO = (1-p)·Σ p^(d-1) (A_d = 1)
    got = rbo_truncated(a, a, "node", "s", k=20, p=0.9).collect()[0]
    want = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 21))
    assert got.n_items == 20
    assert got.rbo == pytest.approx(want, abs=1e-5)
    # disjoint rankings -> 0
    b = spark.createDataFrame(
        [(f"m{i}", float(100 - i)) for i in range(20)], "node string, s double"
    )
    got2 = rbo_truncated(a, b, "node", "s", k=20, p=0.9).collect()[0]
    assert got2.rbo == 0.0 and got2.n_items == 40


def test_rbo_top_weighted(spark):
    """Agreement at the TOP is worth more than the same agreement at
    the bottom — the defining RBO property Kendall τ lacks."""
    from ddaugner_spark.operators.retrieval import rbo_truncated

    base = [(f"n{i}", float(100 - i)) for i in range(10)]
    a = spark.createDataFrame(base, "node string, s double")
    # swap ranks 1&2 vs swap ranks 9&10
    def swapped(i, j):
        rows = list(base)
        rows[i], rows[j] = (rows[i][0], rows[j][1]), (rows[j][0], rows[i][1])
        return spark.createDataFrame(rows, "node string, s double")

    top_swap = rbo_truncated(a, swapped(0, 1), "node", "s", k=10).collect()[0]
    bot_swap = rbo_truncated(a, swapped(8, 9), "node", "s", k=10).collect()[0]
    assert top_swap.rbo < bot_swap.rbo


# ---------------------------------------------------------------- HHI

def test_hhi_even_and_monopoly(spark):
    from ddaugner_spark.operators.stats import hhi_concentration

    even = spark.createDataFrame(
        [(f"s{i % 4}",) for i in range(40)], "g string"
    )
    r = hhi_concentration(even, "g").collect()[0]
    assert r.hhi == pytest.approx(0.25, abs=1e-6)
    assert r.effective_groups == pytest.approx(4.0, abs=1e-6)
    mono = spark.createDataFrame([("only",)] * 10, "g string")
    r2 = hhi_concentration(mono, "g").collect()[0]
    assert r2.hhi == 1.0 and r2.effective_groups == 1.0
    # skewed: shares (0.7, 0.1, 0.1, 0.1) -> HHI .52, eff < 2
    skew = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] + [("c",)] + [("d",)], "g string"
    )
    r3 = hhi_concentration(skew, "g").collect()[0]
    assert r3.hhi == pytest.approx(0.52, abs=1e-6)
    assert r3.effective_groups < 2.0


# ---------------------------------------------------------------- sBG

def test_sbg_recovers_exact_sbg_cohort(spark):
    """A cohort whose survival follows an exact sBG(α=1, β=2) — S(t) =
    B(1, 2+t)/B(1, 2) = 2/(2+t): the closed-form fit must recover the
    parameters and the week-3/4 projections must match the observed
    holdout exactly."""
    import datetime

    from ddaugner_spark.operators.events import sbg_retention

    # S: 1, 2/3, 2/4, 2/5, 2/6 -> of 60 users: 60, 40, 30, 24, 20
    survivors = [60, 40, 30, 24, 20]
    rows = []
    eid = 0
    for week, n_alive in enumerate(survivors):
        for u in range(n_alive):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(weeks=week),
                    u,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = sbg_retention(ev).collect()[0]
    assert got.n0 == 60
    assert got.r1 == pytest.approx(2 / 3, abs=1e-6)
    assert got.r2 == pytest.approx(1 / 2, abs=1e-6)
    assert got.alpha == pytest.approx(1.0, abs=1e-4)
    assert got.beta == pytest.approx(2.0, abs=1e-4)
    # holdout: projections equal the observed sBG tail
    assert got.r3_proj == pytest.approx(got.r3_obs, abs=1e-4)
    assert got.r4_proj == pytest.approx(got.r4_obs, abs=1e-4)
    # the defining sBG property: retention ratios RISE
    assert got.r2 / got.r1 < got.r3_obs / got.r2 < got.r4_obs / got.r3_obs


# ---------------------------------------------------------------- LTV

def test_ltv_hand_cohort(spark):
    import datetime

    from ddaugner_spark.operators.events import cohort_ltv

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        # cohort week 0: u1, u2; u1 spends 10 then 5 next week
        (0, base, 1, "purchase", 10.0),
        (1, base, 2, "view", 0.0),
        (2, base + datetime.timedelta(weeks=1), 1, "purchase", 5.0),
        # cohort week 1: u3 spends 7
        (3, base + datetime.timedelta(weeks=1), 3, "purchase", 7.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r.cohort_week, r.week_offset): r for r in cohort_ltv(ev).collect()
    }
    c0 = base.strftime("%Y-%m-%d")
    c1 = (base + datetime.timedelta(weeks=1)).strftime("%Y-%m-%d")
    assert got[(c0, 0)].cohort_size == 2
    assert got[(c0, 0)].ltv == pytest.approx(5.0, abs=1e-6)   # 10/2
    assert got[(c0, 1)].ltv == pytest.approx(7.5, abs=1e-6)   # 15/2
    assert got[(c1, 0)].cohort_size == 1
    assert got[(c1, 0)].ltv == pytest.approx(7.0, abs=1e-6)
    # LTV curves are monotone within a cohort
    assert got[(c0, 1)].cum_cents >= got[(c0, 0)].cum_cents


# -------------------------------------------------------- Holt-Winters

def _hw_events(spark, values):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
         "u", "m", float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )


def test_hw_perfect_seasonal_fit(spark):
    """x_t = 10 + pattern[t mod 7] with a zero-sum pattern: the warm-up
    init recovers level and seasonals exactly, and every post-warmup
    fitted value equals x (trend stays 0) — the defining fixed point
    of additive Holt-Winters."""
    from ddaugner_spark.operators.events import holt_winters

    pattern = [3, -2, 1, 0, -1, 2, -3]
    vals = [10 + pattern[i % 7] for i in range(21)]
    out = holt_winters(_hw_events(spark, vals)).collect()
    assert len(out) == 14  # 21 days minus 7 warm-up
    for r in out:
        assert r.trend == pytest.approx(0.0, abs=1e-9)
        assert r.level == pytest.approx(10.0 * 100000, abs=1e-6)
        assert r.fitted == pytest.approx(float(r.x), abs=1e-6)


def test_hw_matches_eager_recursion(spark):
    from ddaugner_spark.operators.events import holt_winters

    vals = [12, 9, 14, 11, 10, 15, 8, 13, 10, 16, 9, 12, 14, 11, 17, 10]
    out = sorted(
        holt_winters(_hw_events(spark, vals)).collect(), key=lambda r: r.d
    )
    xs = [v * 100 * 1000 // 1 for v in vals]  # mv fixed-point (1 event/day)
    l = sum(xs[:7]) / 7.0
    b = 0.0
    s = [x - l for x in xs[:7]]
    for k, r in enumerate(out):
        i = 8 + k
        pos = (i - 1) % 7
        sp = s[pos]
        x = xs[i - 1]
        fitted = l + b + sp
        l_new = 0.5 * (x - sp) + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        s[pos] = 0.5 * (x - l_new) + 0.5 * sp
        l = l_new
        assert r.fitted == pytest.approx(fitted, abs=1e-4)
        assert r.level == pytest.approx(l, abs=1e-4)
        assert r.trend == pytest.approx(b, abs=1e-4)
        assert r.seasonal == pytest.approx(s[pos], abs=1e-4)
        assert r.season_idx == pos


# ------------------------------------------------------ Poisson rates

def test_poisson_rate_test_hand_counts(spark):
    import datetime
    import math

    from ddaugner_spark.operators.events import poisson_rate_test

    rows = []
    eid = 0
    # 9 errors before the split, 4 after, plus noise of other types
    for k in range(9):
        rows.append((eid, datetime.datetime(2024, 1, 10), "u", "error", 1.0, "{}")); eid += 1
    for k in range(4):
        rows.append((eid, datetime.datetime(2024, 1, 20), "u", "error", 1.0, "{}")); eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 20), "u", "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = poisson_rate_test(ev, "error", "2024-01-16").collect()[0]
    assert (got.k_before, got.k_after) == (9, 4)
    assert got.z == pytest.approx(5 / math.sqrt(13), abs=1e-6)
    assert got.rate_ratio == pytest.approx(2.25, abs=1e-6)
