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
