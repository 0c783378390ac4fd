"""Round-5 session-10 batch 3: Mann-Whitney U, Kaplan-Meier survival,
shuffle-skew report, Fellegi-Sunter weights.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_mann_whitney, q_kaplan_meier,
q_skew_report, q_fs_weights).
"""

import datetime as dt
import math

from ddaugner_spark.operators.er import fellegi_sunter_weights
from ddaugner_spark.operators.events import kaplan_meier
from ddaugner_spark.operators.stats import mann_whitney_u, skew_report


def test_mann_whitney_separated_samples(spark):
    # a = {1, 2, 3}, b = {4, 5, 6}: no overlap, no ties
    # U_a = 0 (every a below every b), U_b = 9
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    r = mann_whitney_u(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.u_a, r.u_b) == (3, 3, 0.0, 9.0)
    # var = (9/12)*(7 - 0) = 5.25 ; z = (0 - 4.5)/sqrt(5.25)
    assert r.z == round(-4.5 / math.sqrt(5.25), 6)


def test_mann_whitney_ties_average_ranks(spark):
    # a = {1, 2}, b = {2, 3}: value 2 tied across groups ->
    # doubled ranks: 1->2, 2->5, 3->8 ; R_a = (2+5)/2 = 3.5 ; U_a = 0.5
    rows = [("a", 0.01), ("a", 0.02), ("b", 0.02), ("b", 0.03)]
    r = mann_whitney_u(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert (r.u_a, r.u_b) == (0.5, 3.5)


def test_mann_whitney_degenerate_sentinel(spark):
    rows = [("a", 1.0), ("b", 1.0)]
    r = mann_whitney_u(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert r.z == -9.9


def _ev(spark, rows):
    """rows: (user_id, hour_offset, event_type, value)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=h), u, t, float(v), "{}")
            for i, (u, h, t, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_kaplan_meier_hand_curve(spark):
    # user 1: death at t=1h ; user 2: death at t=2h ; user 3: censored
    # at t=2h ; user 4: censored at t=3h
    rows = [
        (1, 0, "view", 1.0), (1, 1, "purchase", 450.0),
        (2, 0, "view", 1.0), (2, 2, "purchase", 500.0),
        (3, 0, "view", 1.0), (3, 2, "view", 1.0),
        (4, 0, "view", 1.0), (4, 3, "view", 1.0),
    ]
    out = {r.t_h: r for r in kaplan_meier(_ev(spark, rows)).collect()}
    # t=1: n_risk 4, d 1 -> S = 3/4
    assert (out[1].n_risk, out[1].d, out[1].c) == (4, 1, 0)
    assert out[1].survival == 0.75
    # t=2: n_risk 3, d 1, c 1 -> S = 3/4 * 2/3 = 1/2
    assert (out[2].n_risk, out[2].d, out[2].c) == (3, 1, 1)
    assert out[2].survival == 0.5
    # t=3: n_risk 1, d 0, c 1 -> S unchanged
    assert (out[3].n_risk, out[3].d, out[3].c) == (1, 0, 1)
    assert out[3].survival == 0.5


def test_kaplan_meier_death_below_threshold_is_censoring(spark):
    rows = [(1, 0, "purchase", 10.0), (1, 2, "view", 1.0)]
    r = kaplan_meier(_ev(spark, rows)).collect()[0]
    assert (r.t_h, r.d, r.c) == (2, 0, 1)


def test_skew_report_uniform_vs_hub(spark):
    uni = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    r_uni = skew_report(uni, "k", n_buckets=8).collect()
    assert sum(r.n_rows for r in r_uni) == 2000
    assert all(abs(r.share - 0.125) < 0.05 for r in r_uni)
    assert r_uni[0].imbalance < 1.3
    hub = spark.createDataFrame(
        [(7,)] * 1900 + [(i,) for i in range(100)], ["k"]
    )
    r_hub = skew_report(hub, "k", n_buckets=8).collect()
    assert r_hub[0].imbalance > 4.0  # one bucket holds the hub key
    # imbalance is identical on every row (it is a table-level factor)
    assert len({r.imbalance for r in r_hub}) == 1


def test_fellegi_sunter_weights_separating_feature(spark):
    # 4 match pairs all agree on f1; 4 non-match pairs all disagree;
    # f2 agrees everywhere (uninformative)
    rows = [(True, True, True)] * 4 + [(False, False, True)] * 4
    df = spark.createDataFrame(rows, ["is_match", "f1", "f2"])
    out = {
        r.feature: r
        for r in fellegi_sunter_weights(
            df, "is_match", ["f1", "f2"]
        ).collect()
    }
    f1 = out["f1"]
    assert (f1.n_match, f1.agree_match, f1.agree_nonmatch) == (4, 4, 0)
    # m = 5/6, u = 1/6 -> w_agree = log2(5) ; w_disagree = log2(1/5)
    assert f1.m == round(5 / 6, 6) and f1.u == round(1 / 6, 6)
    assert f1.w_agree == round(math.log2(5.0), 6)
    assert f1.w_disagree == round(math.log2(1 / 5), 6)
    f2 = out["f2"]
    assert f2.w_agree == 0.0  # agrees in both classes: zero evidence
