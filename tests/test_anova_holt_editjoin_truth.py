"""One-way ANOVA, Holt linear smoothing, deletion-neighborhood edit
join, Sums truth discovery (operators/stats.py anova_oneway,
events.py holt_linear, er.py deletion_neighborhood_pairs /
truth_discovery_sums)."""

import datetime
import itertools

import pytest

from ddaugner_spark.operators.er import (
    deletion_neighborhood_pairs,
    truth_discovery_sums,
)
from ddaugner_spark.operators.events import holt_linear
from ddaugner_spark.operators.stats import anova_oneway


# ---------------------------------------------------------------- ANOVA


def test_anova_hand_value(spark):
    # a=[1,2,3], b=[4,5,6]: ssb = 36/3 + 225/3 - 441/6 = 13.5,
    # ssw = 91 - 87 = 4, msb = 13.5, msw = 4/4 = 1 -> F = 13.5
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)],
        ["g", "x"],
    )
    row = anova_oneway(df, "g", "x").collect()[0]
    assert (row.k, row.n, row.dof_between, row.dof_within) == (2, 6, 1, 4)
    assert row.ssb == pytest.approx(13.5)
    assert row.ssw == pytest.approx(4.0)
    assert row.f_stat == pytest.approx(13.5)


def test_anova_identical_groups_zero_f(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 2)], ["g", "x"]
    )
    row = anova_oneway(df, "g", "x").collect()[0]
    assert row.ssb == pytest.approx(0.0)
    assert row.f_stat == pytest.approx(0.0)


def test_anova_degenerate_single_group(spark):
    # k = 1 -> dof_between 0 -> F guarded to NULL, not a crash
    df = spark.createDataFrame([("a", 1), ("a", 5)], ["g", "x"])
    row = anova_oneway(df, "g", "x").collect()[0]
    assert (row.k, row.dof_between) == (1, 0)
    assert row.f_stat is None and row.msb is None


# ----------------------------------------------------------------- Holt


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d), 1, "view", v, "{}")
            for i, (d, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_holt_hand_recursion(spark):
    # x = [10, 20, 30]; l0=10 b0=0 f0=10; l1=15 b1=2.5 f1=10;
    # l2=23.75 b2=5.625 f2=17.5
    out = holt_linear(_ev(spark, [(1, 10.0), (2, 20.0), (3, 30.0)]))
    rows = sorted(out.collect(), key=lambda r: r.d)
    assert [r.x for r in rows] == [10.0, 20.0, 30.0]
    assert [r.level for r in rows] == [10.0, 15.0, 23.75]
    assert [r.trend for r in rows] == [0.0, 2.5, 5.625]
    assert [r.fitted for r in rows] == [10.0, 10.0, 17.5]


def test_holt_daily_mean_collapse(spark):
    # two events on one day average to x = 1.5 before the fold
    out = holt_linear(_ev(spark, [(1, 1.0), (1, 2.0)]))
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].x == pytest.approx(1.5)
    assert rows[0].level == pytest.approx(1.5)
    assert rows[0].trend == 0.0


# ------------------------------------------------- deletion-neighborhood


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_pairs_hand_set(spark):
    names = ["spark", "sark", "spork", "spa", "ab", "ba", "abc"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b): r.dist
        for r in deletion_neighborhood_pairs(df).collect()
    }
    # ab/ba share the signatures 'a' and 'b' but are at distance 2:
    # the levenshtein verify must kill them
    assert got == {
        ("sark", "spark"): 1,
        ("spark", "spork"): 1,
        ("ab", "abc"): 1,
    }


def test_deletion_pairs_complete_vs_naive(spark):
    # FastSS completeness for d=1: signature join == naive all-pairs
    names = [
        "merge", "merg", "marge", "mergee", "scan", "scam", "span",
        "filter", "filler", "fitter", "x", "xy", "y",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.name_a, r.name_b)
        for r in deletion_neighborhood_pairs(df).collect()
    }
    want = {
        tuple(sorted(p))
        for p in itertools.combinations(names, 2)
        if _lev(p[0], p[1]) <= 1
    }
    assert got == want


def test_deletion_pairs_dedupes_input(spark):
    df = spark.createDataFrame(
        [("rose",), ("rose",), ("rosy",)], ["name"]
    )
    rows = deletion_neighborhood_pairs(df).collect()
    assert len(rows) == 1 and rows[0].dist == 1


# ------------------------------------------------------ truth discovery


def test_truth_discovery_trust_beats_majority(spark):
    # item X: v1 by {A,B}, v2 by {C,D,E} (count majority v2).  A and B
    # also back the 6-strong consensus on Y, so trust(A)=trust(B)=2+6=8
    # while trust(C..E)=3 -> conf2(X,v1)=16 > conf2(X,v2)=9.
    claims = [("A", "X", "v1"), ("B", "X", "v1"),
              ("C", "X", "v2"), ("D", "X", "v2"), ("E", "X", "v2")]
    claims += [(s, "Y", "w") for s in ["A", "B", "F", "G", "H", "I"]]
    df = spark.createDataFrame(claims, ["source", "item", "value"])
    out = {(r.item, r.value): r for r in truth_discovery_sums(df).collect()}
    x1, x2 = out[("X", "v1")], out[("X", "v2")]
    assert (x1.support, x2.support) == (2, 3)
    assert (x1.conf, x2.conf) == (16, 9)
    assert x1.is_winner and not x2.is_winner
    assert x1.share == pytest.approx(16 / 25)
    assert x2.share == pytest.approx(9 / 25)
    assert out[("Y", "w")].is_winner


def test_truth_discovery_tie_breaks_on_value(spark):
    claims = [("A", "X", "b"), ("B", "X", "a")]
    out = {r.value: r for r in truth_discovery_sums(
        spark.createDataFrame(claims, ["source", "item", "value"])
    ).collect()}
    assert out["a"].conf == out["b"].conf
    assert out["a"].is_winner and not out["b"].is_winner


def test_truth_discovery_dedupes_claims(spark):
    # the same (source, item, value) row repeated must count once
    claims = [("A", "X", "v")] * 5 + [("B", "X", "u")]
    out = {r.value: r for r in truth_discovery_sums(
        spark.createDataFrame(claims, ["source", "item", "value"])
    ).collect()}
    assert out["v"].support == 1 and out["u"].support == 1
