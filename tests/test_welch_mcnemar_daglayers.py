"""Welch's t test, McNemar's paired test, DAG longest-path layering
(operators/stats.py welch_t / mcnemar_paired, operators/graph.py
dag_layers).

The sf gate replays each against its SQL twin on the corpus; the
discriminating numerics are pinned here against closed-form hand
calculations (scipy-textbook Welch example, a 2×2 McNemar table with
known continuity-corrected statistic, a hand-layered DAG with a
shortcut edge and a convergence-past-depth check).
"""

import math

import pytest

from ddaugner_spark.operators.graph import dag_layers
from ddaugner_spark.operators.stats import mcnemar_paired, welch_t


# ------------------------------------------------------------- Welch

def _welch_py(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return t, dof


def test_welch_matches_closed_form(spark):
    xs = [27, 23, 25, 22, 24, 28, 30, 21]   # group a
    ys = [18, 20, 19, 24, 17, 16]           # group b
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = welch_t(df, "g", "x", "a", "b").collect()[0]
    t, dof = _welch_py(xs, ys)
    assert got.n_a == 8 and got.n_b == 6
    assert got.t_stat == pytest.approx(t, abs=1e-6)
    assert got.dof == pytest.approx(dof, abs=1e-6)
    assert got.mean_a == pytest.approx(sum(xs) / 8, abs=1e-6)
    # Cohen's d with pooled SD
    va = sum((x - sum(xs) / 8) ** 2 for x in xs) / 7
    vb = sum((y - sum(ys) / 6) ** 2 for y in ys) / 5
    pooled = (7 * va + 5 * vb) / 12
    assert got.cohens_d == pytest.approx(
        (sum(xs) / 8 - sum(ys) / 6) / math.sqrt(pooled), abs=1e-6
    )


def test_welch_degenerate_group_yields_null(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], ["g", "x"]
    )
    got = welch_t(df, "g", "x", "a", "b").collect()[0]
    assert got.n_b == 1 and got.t_stat is None and got.dof is None


# ----------------------------------------------------------- McNemar

def test_mcnemar_textbook_table(spark):
    # classic 2×2: both=59, a-only=16, b-only=6, neither=80
    rows = (
        [(True, True)] * 59
        + [(True, False)] * 16
        + [(False, True)] * 6
        + [(False, False)] * 80
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    got = mcnemar_paired(df, "a", "b").collect()[0]
    assert (got.n, got.n_both, got.n_neither) == (161, 59, 80)
    assert (got.n_a_only, got.n_b_only) == (16, 6)
    # Edwards continuity correction: (|16-6|-1)^2 / 22
    assert got.chi2_cc == pytest.approx(81 / 22, abs=1e-6)


def test_mcnemar_no_discordance_is_null(spark):
    df = spark.createDataFrame(
        [(True, True), (False, False)], ["a", "b"]
    )
    got = mcnemar_paired(df, "a", "b").collect()[0]
    assert got.chi2_cc is None and got.n == 2


# -------------------------------------------------------- DAG layers

def test_dag_layers_hand_counted(spark):
    # diamond + tail: a→b, a→c, b→d, c→d, d→e, plus shortcut a→d
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("a", "d")],
        ["src", "dst"],
    )
    got = {r.node: r.layer for r in dag_layers(e, iters=8).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_dag_layers_converges_within_depth(spark):
    # a 6-node chain needs exactly 5 rounds; 5 and 8 agree
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    e = spark.createDataFrame(chain, ["src", "dst"])
    five = {r.node: r.layer for r in dag_layers(e, iters=5).collect()}
    eight = {r.node: r.layer for r in dag_layers(e, iters=8).collect()}
    assert five == eight
    assert five["n5"] == 5 and five["n0"] == 0


def test_dag_layers_rejects_bad_iters(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        dag_layers(e, iters=0)


# ----------------------------------------------------- CMH stratified

def _cmh_rows(strata):
    """Expand {stratum: (a, b, c, d)} into (k, x, y) rows."""
    rows = []
    for k, (a, b, c, d) in strata.items():
        rows += [(k, True, True)] * a + [(k, True, False)] * b
        rows += [(k, False, True)] * c + [(k, False, False)] * d
    return rows


def _cmh_expected(strata):
    """Eager replay of cmh_test's quantized fold."""
    sum_a = eqs = vqs = rqs = sqs = n = 0
    for a, b, c, d in strata.values():
        nk = a + b + c + d
        if nk < 2:
            continue
        n += nk
        sum_a += a
        eqs += round(1e6 * (a + b) * (a + c) / nk)
        vqs += round(
            1e6 * ((a + b) * (c + d)) * ((a + c) * (b + d))
            / ((nk * nk) * (nk - 1))
        )
        rqs += round(1e6 * a * d / nk)
        sqs += round(1e6 * b * c / nk)
    e, v = eqs / 1e6, vqs / 1e6
    cmh = (sum_a - e) ** 2 / v if v > 0 else None
    or_mh = rqs / sqs if sqs > 0 else None
    return n, sum_a, cmh, or_mh


def test_cmh_two_strata_hand_fold(spark):
    from ddaugner_spark.operators.stats import cmh_test

    strata = {"s1": (10, 5, 3, 12), "s2": (4, 8, 9, 2)}
    df = spark.createDataFrame(_cmh_rows(strata), ["k", "x", "y"])
    got = cmh_test(df, "k", "x", "y").collect()[0]
    n, sum_a, cmh, or_mh = _cmh_expected(strata)
    assert (got.n_strata, got.n, got.sum_a) == (2, n, sum_a)
    assert got.cmh_chi2 == pytest.approx(cmh, abs=1e-6)
    assert got.or_mh == pytest.approx(or_mh, abs=1e-6)


def test_cmh_degenerate_margins_null(spark):
    """One stratum, everyone exposed: V = 0 and b·c = 0, so both the
    statistic and the common OR must be NULL; a 1-row stratum is
    dropped entirely."""
    from ddaugner_spark.operators.stats import cmh_test

    strata = {"s1": (3, 2, 0, 0), "tiny": (1, 0, 0, 0)}
    df = spark.createDataFrame(_cmh_rows(strata), ["k", "x", "y"])
    got = cmh_test(df, "k", "x", "y").collect()[0]
    assert got.n_strata == 1 and got.n == 5
    assert got.cmh_chi2 is None and got.or_mh is None


def test_cmh_continuity_correction(spark):
    from ddaugner_spark.operators.stats import cmh_test

    strata = {"s1": (10, 5, 3, 12), "s2": (4, 8, 9, 2)}
    df = spark.createDataFrame(_cmh_rows(strata), ["k", "x", "y"])
    got = cmh_test(df, "k", "x", "y", correction=True).collect()[0]
    n, sum_a, _, _ = _cmh_expected(strata)
    eqs = sum(
        round(1e6 * (a + b) * (a + c) / (a + b + c + d))
        for a, b, c, d in strata.values()
    )
    vqs = sum(
        round(
            1e6 * ((a + b) * (c + d)) * ((a + c) * (b + d))
            / (((a + b + c + d) ** 2) * (a + b + c + d - 1))
        )
        for a, b, c, d in strata.values()
    )
    diff = max(abs(sum_a - eqs / 1e6) - 0.5, 0.0)
    assert got.cmh_chi2 == pytest.approx(diff * diff / (vqs / 1e6), abs=1e-6)
