"""Unit tests for session-12 batch 6: exact group order statistics,
seasonal-naive backtest, streaming OHLC."""

import datetime

from pyspark.sql import functions as F

from ddaugner_spark.operators import stats, temporal


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


def _ts(day, h):
    return datetime.datetime(2024, 1, day, h)


def test_group_median_odd_and_even(spark):
    rows = [(i, _ts(1, 0), "u", "odd", v) for i, v in
            enumerate([1.0, 2.0, 9.0])]
    rows += [(10 + i, _ts(1, 0), "u", "even", v) for i, v in
             enumerate([1.0, 2.0, 3.0, 10.0])]
    out = {r["series"]: r for r in
           stats.group_order_stats(_ev(spark, rows)).collect()}
    # odd n=3: median = 2.0 → median2_c = 400
    assert out["odd"]["median2_c"] == 400 and out["odd"]["median"] == 2.0
    # even n=4: median = (2+3)/2 = 2.5 → median2_c = 500
    assert out["even"]["median2_c"] == 500 and out["even"]["median"] == 2.5
    # p90: k90 = ceil(0.9·4) = 4 → the max value
    assert out["even"]["p90_c"] == 1000


def test_seasonal_naive_beats_persistence_on_periodic_series(spark):
    # daily-periodic hourly counts over 3 days: seasonal lag is exact
    # (SAE 0), persistence is wrong at every regime flip
    rows = []
    eid = 0
    for day in (1, 2, 3):
        for h in range(24):
            n = 3 if h < 12 else 1
            for _ in range(n):
                eid += 1
                rows.append((eid, _ts(day, h), "u", "t", 1.0))
    out = temporal.seasonal_naive_backtest(_ev(spark, rows)).collect()[0]
    assert out["n_eval"] == 48  # days 2-3
    assert out["sae_seasonal"] == 0 and out["mae_seasonal"] == 0.0
    assert out["sae_naive"] > 0


def test_stream_ohlc_matches_batch_on_closed_windows(spark, sf_dir, tmp_path):
    from ddaugner_spark.streaming import incremental_ohlc

    stream = incremental_ohlc(
        spark, f"{sf_dir}/events.parquet", str(tmp_path / "ck_ohlc")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    max_us = ev.agg(
        F.max(F.expr("unix_micros(cast(ts as timestamp))"))
    ).collect()[0][0]
    batch = (
        temporal.ohlc_bars(ev)
        .withColumnRenamed("bucket", "b")
        .filter((F.col("b") + 3600) * 1_000_000 <= max_us - 7_200_000_000)
    )
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0
