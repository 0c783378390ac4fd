"""TOST equivalence (operators/stats.py tost_equivalence), exact 1-D
Wasserstein (wasserstein_1d), Brier/Murphy decomposition
(operators/traindata.py brier_decomposition).

Pinned against closed-form hand calculations: a two-sample fixture with
known Welch moments, a brute-force transport-plan W1 (scipy-definition
mean |sorted quantile diffs| on equal-size samples), and a bin-constant
forecast fixture where the Murphy identity BS = REL − RES + UNC is
EXACT.
"""

import math

import pytest

from ddaugner_spark.operators.stats import tost_equivalence, wasserstein_1d
from ddaugner_spark.operators.traindata import brier_decomposition


# -------------------------------------------------------------- TOST

def test_tost_matches_closed_form(spark):
    a = [100, 110, 105, 95, 90]
    b = [102, 108, 99, 101]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, x long")
    got = tost_equivalence(df, "g", "x", "A", "B", margin=10.0).collect()[0]
    import statistics

    ma, mb = statistics.mean(a), statistics.mean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    se = math.sqrt(se2)
    assert got.mean_diff == pytest.approx(ma - mb, abs=1e-6)
    assert got.se == pytest.approx(se, abs=1e-6)
    assert got.t_lower == pytest.approx((ma - mb + 10) / se, abs=1e-6)
    assert got.t_upper == pytest.approx((ma - mb - 10) / se, abs=1e-6)
    dof = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got.dof == pytest.approx(dof, abs=1e-6)


def test_tost_degenerate_null(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 5)], "g string, x long"
    )
    got = tost_equivalence(df, "g", "x", "A", "B", margin=1.0).collect()[0]
    assert got.t_lower is None and got.t_upper is None and got.se is None


# -------------------------------------------------------- Wasserstein

def test_w1_equal_size_quantile_form(spark):
    # equal sample sizes: W1 = mean |sorted_a[i] - sorted_b[i]|
    a = [1, 3, 7, 20]
    b = [2, 3, 9, 14]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = wasserstein_1d(df, "g", "v", "A", "B").collect()[0]
    want = sum(abs(x - y) for x, y in zip(sorted(a), sorted(b))) / len(a)
    assert got.w1 == pytest.approx(want, abs=1e-6)
    assert got.w1_num == int(round(want * len(a) * len(b)))


def test_w1_shift_and_identity(spark):
    a = [5, 10, 15]
    rows = [("A", v) for v in a] + [("B", v + 7) for v in a]
    df = spark.createDataFrame(rows, "g string, v long")
    assert wasserstein_1d(df, "g", "v", "A", "B").collect()[0].w1 == (
        pytest.approx(7.0, abs=1e-6)
    )
    same = spark.createDataFrame(
        [("A", v) for v in a] + [("B", v) for v in a], "g string, v long"
    )
    r = wasserstein_1d(same, "g", "v", "A", "B").collect()[0]
    assert r.w1 == 0.0 and r.w1_num == 0


def test_w1_single_value_grid_no_nulls(spark):
    df = spark.createDataFrame(
        [("A", 5), ("A", 5), ("B", 5)], "g string, v long"
    )
    r = wasserstein_1d(df, "g", "v", "A", "B").collect()[0]
    assert (r.n_a, r.n_b, r.w1_num, r.w1) == (2, 1, 0, 0.0)


# -------------------------------------------------------------- Brier

def test_brier_murphy_identity_bin_constant(spark):
    """Forecasts constant within bins (cap at bin-edge multiples of
    50 → p̄_b is the forecast for all rows of its bin) — the Murphy
    identity BS = REL − RES + UNC must hold EXACTLY."""
    rows = []
    # bin 0: p=0.1 (cap 50)   with 1/10 positives
    rows += [(50, "en")] * 1 + [(50, "de")] * 9
    # bin 5: p=0.5 (cap 250)  with 3/4 positives
    rows += [(250, "en")] * 3 + [(250, "de")] * 1
    # bin 9: p=0.9 (cap 450)  with 9/10 positives
    rows += [(450, "en")] * 9 + [(450, "de")] * 1
    docs = spark.createDataFrame(
        [(i, t[0], t[1]) for i, t in enumerate(rows)],
        "doc_id long, n_chars long, lang string",
    )
    got = brier_decomposition(docs, n_bins=10).collect()[0]
    n = len(rows)
    brier = sum(
        (c / 500 - (1 if l == "en" else 0)) ** 2 for c, l in rows
    ) / n
    ybar = sum(1 for _, l in rows if l == "en") / n
    bins = {}
    for c, l in rows:
        bins.setdefault(c, []).append(1 if l == "en" else 0)
    rel = sum(len(v) * (c / 500 - sum(v) / len(v)) ** 2 for c, v in bins.items()) / n
    res = sum(len(v) * (sum(v) / len(v) - ybar) ** 2 for v in bins.values()) / n
    unc = ybar * (1 - ybar)
    assert got.brier == pytest.approx(brier, abs=1e-6)
    assert got.reliability == pytest.approx(rel, abs=1e-6)
    assert got.resolution == pytest.approx(res, abs=1e-6)
    assert got.uncertainty == pytest.approx(unc, abs=1e-6)
    assert brier == pytest.approx(rel - res + unc, abs=1e-12)


def test_brier_within_bin_variance_wedge(spark):
    """Raw 1/500-grained forecasts vary inside bins: the generalized
    (Stephenson) decomposition closes the Murphy identity with the
    within-bin forecast variance and covariance terms —
    BS = REL − RES + UNC + WBV − 2·WBC."""
    rows = [(37, "de"), (43, "en"), (260, "en"), (288, "de"), (490, "en")]
    docs = spark.createDataFrame(
        [(i, c, l) for i, (c, l) in enumerate(rows)],
        "doc_id long, n_chars long, lang string",
    )
    got = brier_decomposition(docs, n_bins=10).collect()[0]
    n = len(rows)
    per_bin = {}
    for c, l in rows:
        per_bin.setdefault(min(c // 50, 9), []).append(
            (c / 500, 1 if l == "en" else 0)
        )
    wbv = wbc = 0.0
    for v in per_bin.values():
        pb = sum(p for p, _ in v) / len(v)
        yb = sum(y for _, y in v) / len(v)
        wbv += sum((p - pb) ** 2 for p, _ in v)
        wbc += sum((p - pb) * (y - yb) for p, y in v)
    wbv /= n
    wbc /= n
    assert got.brier == pytest.approx(
        got.reliability - got.resolution + got.uncertainty + wbv - 2 * wbc,
        abs=5e-6,
    )
