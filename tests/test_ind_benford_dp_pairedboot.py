"""Round-5 session-10 batch 2: inclusion-dependency discovery, Benford
first-digit audit, deterministic DP histogram, paired bootstrap F1.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_ind_profile, q_benford,
q_dp_histogram, q_paired_bootstrap).
"""

import math

from ddaugner_spark.operators.privacy import dp_histogram
from ddaugner_spark.operators.scoring import paired_bootstrap_f1
from ddaugner_spark.operators.stats import (
    BENFORD_P,
    benford_digits,
    ind_profile,
)


def test_ind_profile_exact_and_partial(spark):
    fact = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    out = {
        r.from_col: r
        for r in ind_profile(
            [
                (fact, "k", "fact.k", dim, "k", "dim.k"),
                (dim, "k", "dim.k", fact, "k", "fact.k"),
            ]
        ).collect()
    }
    f = out["fact.k"]
    assert (f.ndv_from, f.n_covered, f.coverage, f.is_ind) == (2, 2, 1.0, True)
    d = out["dim.k"]
    assert (d.ndv_from, d.n_covered, d.is_ind) == (3, 2, False)
    assert d.coverage == round(2 / 3, 6)


def test_ind_profile_nulls_excluded(spark):
    fact = spark.createDataFrame([(1,), (None,)], "k int")
    dim = spark.createDataFrame([(1,)], "k int")
    r = ind_profile([(fact, "k", "f", dim, "k", "d")]).collect()[0]
    assert (r.ndv_from, r.is_ind) == (1, True)


def test_benford_digit_extraction_and_chi(spark):
    # values 1.00, 1.50, 2.00, 9.99 -> cents 100, 150, 200, 999
    # first digits 1, 1, 2, 9; zero/negative rows dropped
    df = spark.createDataFrame(
        [(1.0,), (1.5,), (2.0,), (9.99,), (0.0,), (-3.0,)], ["value"]
    )
    out = {r.digit: r for r in benford_digits(df, "value").collect()}
    assert sorted(out) == [1, 2, 9]
    assert out[1].n == 2 and out[2].n == 1 and out[9].n == 1
    assert out[1].obs_p == 0.5
    e1 = BENFORD_P[1]
    assert out[1].exp_p == round(e1, 6)
    assert out[1].chi_term == round((2 - 4 * e1) ** 2 / (4 * e1), 6)
    # expected probabilities are the Benford law and sum to 1
    assert abs(sum(BENFORD_P.values()) - 1.0) < 1e-12
    assert BENFORD_P[1] == math.log10(2.0)


def test_dp_histogram_deterministic_release(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 10, ["event_type"]
    )
    a = sorted(dp_histogram(df, "event_type").collect())
    b = sorted(dp_histogram(df, "event_type").collect())
    assert a == b  # pure function of the group key
    for r in a:
        assert r.released == max(0, r.n + round(r.noise))
        assert r.released >= 0
        # Laplace(1) noise at these u's stays small
        assert abs(r.noise) < 30


def test_dp_histogram_epsilon_scales_noise(spark):
    df = spark.createDataFrame([("a",)] * 5, ["event_type"])
    n1 = dp_histogram(df, "event_type", epsilon=1.0).collect()[0].noise
    n2 = dp_histogram(df, "event_type", epsilon=2.0).collect()[0].noise
    # same u, scale b = 1/eps halves: rounding at 6 keeps the ratio
    assert abs(n1 - 2 * n2) < 1e-5


def test_paired_bootstrap_better_system_wins(spark):
    # gold: docs 0..19 each one span (0,0,0,0,PER)
    # system A == gold (perfect); system B predicts nothing for odd docs
    gold = spark.createDataFrame(
        [(i, 0, 0, 0, "PER") for i in range(20)],
        ["doc_id", "sent_id", "start_idx", "end_idx", "tag"],
    )
    b = gold.filter("doc_id % 2 = 0")
    out = paired_bootstrap_f1(gold, b, gold, n_boot=32).collect()[0]
    assert (out.n_docs, out.n_boot) == (20, 32)
    assert out.f1_a == 1.0
    # B: P=1, R=.5 -> F1 = 2/3
    assert out.f1_b == round(2 / 3, 6)
    assert out.delta == round(1 / 3, 6)
    assert out.wins_a + out.wins_b + out.ties == 32
    # A is strictly better on every replicate that samples any odd doc
    assert out.wins_a >= 28 and out.wins_b == 0


def test_paired_bootstrap_identical_systems_tie(spark):
    gold = spark.createDataFrame(
        [(i, 0, 0, 0, "LOC") for i in range(10)],
        ["doc_id", "sent_id", "start_idx", "end_idx", "tag"],
    )
    out = paired_bootstrap_f1(gold, gold, gold, n_boot=16).collect()[0]
    assert out.ties == 16 and out.delta == 0.0
