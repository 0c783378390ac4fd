"""Round-5 session-10 batch 6: integer power-iteration PCA, Theil-Sen
trend, average precision, conversion-lag order statistics.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_pca_top, q_theil_sen,
q_avg_precision, q_conversion_lag).
"""

import datetime as dt

from pyspark.sql import functions as F

from ddaugner_spark.operators.embedding import power_iteration_pca
from ddaugner_spark.operators.events import conversion_lag
from ddaugner_spark.operators.regression import theil_sen_hourly
from ddaugner_spark.operators.traindata import average_precision


def test_pca_finds_dominant_axis(spark):
    # points hugging the x-axis: dominant direction = dim 1
    rows = [
        (0, [1.0, 0.1]), (1, [2.0, -0.1]), (2, [-1.5, 0.05]),
        (3, [1.8, 0.0]), (4, [-2.0, 0.1]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.dim: r for r in power_iteration_pca(emb).collect()}
    assert abs(out[1].v) == 1000       # max component normalized
    assert abs(out[2].v) < 100         # tiny off-axis component
    assert out[1].lam > 0
    # deterministic: same result twice
    out2 = {r.dim: r for r in power_iteration_pca(emb).collect()}
    assert out == out2


def _ev(spark, rows):
    """rows: (event_id, user, minutes_offset, type, value)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=m), u, t, float(v), "{}")
            for i, u, m, t, v in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_theil_sen_linear_series_exact(spark):
    # counts per hour: 1, 2, 3, 4 (slope exactly 1, intercept = y - b)
    rows = []
    eid = 0
    for h in range(4):
        for _ in range(h + 1):
            rows.append((eid, 1, h * 60, "e", 1.0))
            eid += 1
    r = theil_sen_hourly(_ev(spark, rows)).collect()[0]
    assert (r.n_buckets, r.n_pairs) == (4, 6)
    assert r.slope == 1.0
    # b values are absolute hour indices b0..b0+3 with y = b - b0 + 1
    # -> residual y - 1·b = 1 - b0 for every point: intercept = 1 - b0
    b0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert r.intercept == float(1 - b0)
    # robustness: one outlier hour does not move the slope
    rows_out = rows + [(eid + i, 1, 2 * 60, "e", 1.0) for i in range(50)]
    r2 = theil_sen_hourly(_ev(spark, rows_out)).collect()[0]
    assert abs(r2.slope - 1.0) <= 1.0  # bounded, unlike OLS leverage


def test_average_precision_hand_value(spark):
    # ranking by score desc: ids 1(+), 2(-), 3(+), 4(-)
    # AP = (1/1 + 2/3) / 2 = 5/6
    rows = [(1, 40, 1), (2, 30, 0), (3, 20, 1), (4, 10, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "s", "y"])
    r = average_precision(
        df, label=F.col("y") == 1, score=F.col("s"), id_col="doc_id"
    ).collect()[0]
    assert (r.n_pos, r.n_total) == (2, 4)
    assert r.ap == round(5 / 6, 6)


def test_average_precision_perfect_ranking(spark):
    rows = [(1, 9, 1), (2, 8, 1), (3, 1, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "s", "y"])
    r = average_precision(
        df, label=F.col("y") == 1, score=F.col("s"), id_col="doc_id"
    ).collect()[0]
    assert r.ap == 1.0


def test_conversion_lag_exact_order_stats(spark):
    # users 1..4 sign up at t=0; lags to first purchase: 1h, 2h, 3h, 10h
    # user 5 signs up, never purchases; user 6 purchases BEFORE signup
    rows = [(i, u, 0, "signup", 0.0) for i, u in enumerate([1, 2, 3, 4, 5, 6])]
    eid = 10
    for u, lag_h in [(1, 1), (2, 2), (3, 3), (4, 10)]:
        rows.append((eid, u, lag_h * 60, "purchase", 5.0))
        eid += 1
    rows.append((eid, 6, -30, "purchase", 5.0))  # pre-signup: no conversion
    r = conversion_lag(_ev(spark, rows)).collect()[0]
    assert (r.n_from, r.n_converted) == (6, 4)
    # median of {1,2,3,10} = 2.5 (half-point device), p90 = os(4) = 10
    assert r.median2_h == 5 and r.median_h == 2.5
    assert r.p90_h == 10
