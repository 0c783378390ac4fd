"""Allen interval relations, CUPED adjustment, BH-FDR token selection
(operators/temporal.py allen_relations, events.py cuped_adjusted,
textstats.py chi2_bh_select).

The sf gate only exercises the four relations the synthetic event
stream naturally produces (overlaps/overlapped_by/during/contains), so
the full 13-relation ladder is pinned here by construction; CUPED is
pinned on the exact Y = 2X fixture (rho2 = 1, both arms collapse to
the global mean); BH is replayed by an independent pure-python
implementation of the chi-square / exp / step-up chain.
"""

import datetime
import math

import pytest

from ddaugner_spark.operators.events import cuped_adjusted
from ddaugner_spark.operators.temporal import allen_relations
from ddaugner_spark.operators.textstats import chi2_bh_select


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


# ------------------------------------------------------------- Allen

# (relation, a-interval, b-interval) in minutes; type_a='a' < type_b='b'
_CASES = [
    ("before", (0, 10), (20, 30)),
    ("after", (20, 30), (0, 10)),
    ("meets", (0, 10), (10, 20)),
    ("met_by", (10, 20), (0, 10)),
    ("overlaps", (0, 10), (5, 15)),
    ("overlapped_by", (5, 15), (0, 10)),
    ("starts", (0, 5), (0, 10)),
    ("started_by", (0, 10), (0, 5)),
    ("during", (5, 8), (0, 10)),
    ("contains", (0, 10), (5, 8)),
    ("finishes", (5, 10), (0, 10)),
    ("finished_by", (0, 10), (5, 10)),
    ("equals", (0, 10), (0, 10)),
]


def test_allen_all_13_relations(spark):
    rows = []
    for uid, (_, (sa, ea), (sb, eb)) in enumerate(_CASES):
        rows += [
            (uid, "a", _ts(sa)),
            (uid, "a", _ts(ea)),
            (uid, "b", _ts(sb)),
            (uid, "b", _ts(eb)),
        ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r.user_id: r.relation for r in allen_relations(ev).collect()
    }
    assert got == {uid: rel for uid, (rel, _, _) in enumerate(_CASES)}


def test_allen_one_row_per_unordered_pair(spark):
    # 3 types -> C(3,2) = 3 pairs, each once, type_a < type_b
    rows = [(1, t, _ts(m)) for t in ("a", "b", "c") for m in (0, 10)]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = allen_relations(ev).collect()
    assert sorted((r.type_a, r.type_b) for r in out) == [
        ("a", "b"), ("a", "c"), ("b", "c")
    ]
    assert all(r.relation == "equals" for r in out)


# ------------------------------------------------------------- CUPED


def _cuped_events(spark, xs, ys):
    """user u emits xs[u] events on Jan 1 (pre) and ys[u] on Jan 20."""
    rows = []
    for u, (x, y) in enumerate(zip(xs, ys)):
        rows += [(u, datetime.datetime(2024, 1, 1, 0, i)) for i in range(x)]
        rows += [(u, datetime.datetime(2024, 1, 20, 0, i)) for i in range(y)]
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_cuped_perfect_covariate_collapses_arms(spark):
    # Y = 2X exactly: theta = 2, rho2 = 1, every user's adjusted metric
    # is 2*xbar, so BOTH arms' mean_cuped equal the global mean of Y
    ev = _cuped_events(spark, xs=[1, 2, 3, 4], ys=[2, 4, 6, 8])
    out = {r.variant: r for r in cuped_adjusted(ev).collect()}
    assert out[0].n == 2 and out[1].n == 2
    assert out[0].mean_y == pytest.approx(4.0)  # users 0,2: y=2,6
    assert out[1].mean_y == pytest.approx(6.0)  # users 1,3: y=4,8
    for v in (0, 1):
        assert out[v].theta == pytest.approx(2.0)
        assert out[v].rho2 == pytest.approx(1.0)
        assert out[v].mean_cuped == pytest.approx(5.0)


def test_cuped_constant_covariate_is_noop(spark):
    # var(X) = 0 -> theta/rho2 sentinel 0.0, mean_cuped == mean_y
    ev = _cuped_events(spark, xs=[2, 2, 2, 2], ys=[1, 3, 5, 7])
    for r in cuped_adjusted(ev).collect():
        assert r.theta == 0.0 and r.rho2 == 0.0
        assert r.mean_cuped == pytest.approx(r.mean_y)


# ------------------------------------------------------------ BH-FDR


def _bh_replay(counts, totals, alpha=0.05):
    """Pure-python replay of the chi-square(df=2) + exp + step-up chain."""
    n1, n2, n3 = totals
    nn = n1 + n2 + n3
    scored = []
    for tok, (a1, a2, a3) in counts.items():
        t = float(a1 + a2 + a3)
        degen = t == 0 or t == nn or n1 == 0 or n2 == 0 or n3 == 0
        if degen:
            chi2 = 0.0
        else:
            def term(a, ng):
                e1 = t * ng / nn
                e0 = (nn - t) * ng / nn
                o1, o0 = float(a), float(ng - a)
                return (o1 - e1) ** 2 / e1 + (o0 - e0) ** 2 / e0
            chi2 = (term(a1, n1) + term(a2, n2)) + term(a3, n3)
        scored.append((tok, chi2, math.exp(-chi2 / 2.0)))
    ranked = sorted(scored, key=lambda r: (round(r[2], 9), r[0]))
    m = len(ranked)
    kstar = 0
    for i, (_, _, p) in enumerate(ranked, 1):
        if round(p, 9) <= round(alpha * i / m, 9):
            kstar = i
    return {
        tok: (chi2, p, i, i <= kstar)
        for i, (tok, chi2, p) in enumerate(ranked, 1)
    }


def test_bh_fdr_matches_python_replay(spark):
    # 10 docs per group; 'aaa' is en-exclusive (huge chi2, tiny p),
    # 'bbb' is in every doc (degenerate, p=1), 'ccc' is uniform
    # (small chi2), 'ddd' sits in 6 en + 1 zh (intermediate)
    docs = []
    for i in range(10):
        docs.append((f"en{i}", "en",
                     "aaa bbb ccc" if i < 2 else
                     ("aaa bbb ddd" if i < 8 else "aaa bbb")))
    for i in range(10):
        docs.append((f"zh{i}", "zh",
                     "bbb ccc" if i < 2 else ("bbb ddd" if i < 3 else "bbb")))
    for i in range(10):
        docs.append((f"de{i}", "de", "bbb ccc" if i < 2 else "bbb"))
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    out = {r.tok: r for r in chi2_bh_select(df).collect()}
    counts = {"aaa": (10, 0, 0), "bbb": (10, 10, 10),
              "ccc": (2, 2, 2), "ddd": (6, 1, 0)}
    want = _bh_replay(counts, (10, 10, 10))
    assert set(out) == set(want)
    for tok, (chi2, p, rank, rejected) in want.items():
        r = out[tok]
        assert r.chi2 == pytest.approx(round(chi2, 6), abs=1e-9), tok
        assert r.p == pytest.approx(round(p, 6), abs=1e-9), tok
        assert r.bh_rank == rank, tok
        assert bool(r.rejected) is rejected, tok
    # the en-exclusive token is selected, the degenerate one is not
    assert bool(out["aaa"].rejected) is True
    assert bool(out["bbb"].rejected) is False


def test_bh_min_df_filters_rare_tokens(spark):
    docs = [(f"d{i}", "en", "rare common" if i < 4 else "common")
            for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    toks = {r.tok for r in chi2_bh_select(df, min_df=5).collect()}
    assert toks == {"common"}
