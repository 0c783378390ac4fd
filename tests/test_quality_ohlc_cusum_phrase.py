"""Unit tests for session-12 batch 1: the fixed-point quality
classifier, OHLC bars, CUSUM changepoint, and positional phrase search
— hand-computed expectations on tiny frames, plus the value-range
precondition the OHLC packed key depends on."""

import datetime
import glob

import pytest

from ddaugner_spark.operators import retrieval, temporal, traindata


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


def test_quality_classifier_learns_token_signal(spark):
    # train (even doc_id): 'good' appears only in en docs, 'bad' only in
    # non-en; eval (odd doc_id) docs are pure so the classifier must
    # separate them perfectly
    rows = [
        (0, "good good good", "en"),
        (2, "bad bad bad", "de"),
        (4, "good good bad", "en"),
        (1, "good good", "en"),      # eval: all-positive tokens
        (3, "bad bad", "de"),        # eval: all-negative tokens
        (5, "good good good", "fr"), # eval: looks en, labeled other
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in traindata.quality_classifier_eval(docs).collect()
    }
    # w(good) = (5+1)*1e6 DIV (5+2) = 857142; w(bad) = (1+1)*1e6 DIV (4+2)
    # = 333333; prior = (6+1)*1e6 DIV (9+2) = 636363
    assert out == {("en", "en"): 1, ("other", "other"): 1, ("other", "en"): 1}


def test_quality_classifier_unseen_token_backs_off_to_prior(spark):
    # eval doc made entirely of unseen tokens scores exactly the prior
    # → >= prior → predicted positive
    rows = [
        (0, "a a", "en"),
        (2, "b b", "de"),
        (1, "zzz zzz", "de"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = traindata.quality_classifier_eval(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["actual"], r["predicted"]) == ("other", "en")
    # prior = (2+1)*1e6 DIV (4+2) = 500000
    assert r["mean_score_ppm"] == 500000


def test_ohlc_bars_open_close_by_time(spark):
    rows = [
        (1, _ts(9, 15), "u", "t", 5.00),   # open of 9h bucket
        (2, _ts(9, 30), "u", "t", 9.00),   # high
        (3, _ts(9, 45), "u", "t", 1.00),   # low
        (4, _ts(9, 55), "u", "t", 7.00),   # close
        (5, _ts(10, 5), "u", "t", 2.50),   # next bucket
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["bucket"]: r for r in temporal.ohlc_bars(ev).collect()}
    b9 = out[int(_ts(9).replace(tzinfo=datetime.timezone.utc).timestamp())]
    assert (b9["open_c"], b9["high_c"], b9["low_c"], b9["close_c"]) == (
        500, 900, 100, 700,
    )
    assert b9["n"] == 4 and b9["sum_c"] == 2200
    b10 = out[int(_ts(10).replace(tzinfo=datetime.timezone.utc).timestamp())]
    assert (b10["open_c"], b10["close_c"], b10["n"]) == (250, 250, 1)


def test_ohlc_same_timestamp_tiebreaks_on_event_id(spark):
    rows = [
        (7, _ts(9), "u", "t", 3.00),
        (2, _ts(9), "u", "t", 8.00),  # same ts, lower event_id → open
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    r = temporal.ohlc_bars(ev).collect()[0]
    assert r["open_c"] == 800 and r["close_c"] == 300


def test_cusum_finds_level_shift(spark):
    # 6 hourly buckets: counts 1,1,1,5,5,5 — S_i peaks at i=3 (end of
    # the low regime): n*S_3 = 6*3 - 3*18 = -36
    rows = []
    eid = 0
    for h, c in enumerate([1, 1, 1, 5, 5, 5]):
        for _ in range(c):
            eid += 1
            rows.append((eid, _ts(h), "u", "t", 1.0))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    r = temporal.cusum_changepoint(ev).collect()[0]
    assert r["n_buckets"] == 6 and r["total"] == 18
    assert r["cusum_peak"] == 36 and r["side"] == -1
    assert r["cp_bucket"] == int(
        _ts(2).replace(tzinfo=datetime.timezone.utc).timestamp()
    )


def test_cusum_dense_grid_counts_missing_hours(spark):
    # events only at hours 0 and 3 → grid has 4 buckets, gaps count 0
    rows = [(1, _ts(0), "u", "t", 1.0), (2, _ts(3), "u", "t", 1.0)]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    r = temporal.cusum_changepoint(ev).collect()[0]
    assert r["n_buckets"] == 4 and r["total"] == 2


def test_phrase_search_counts_overlapping_occurrences(spark):
    docs = spark.createDataFrame(
        [
            (1, "window window window scan"),   # 'window window' ×2 (overlap)
            (2, "hash join then hash join"),    # 'hash join' ×2
            (3, "join hash"),                   # reversed — no match
            (4, None),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["phrase"], r["doc_id"]): (r["n_occ"], r["first_pos"])
        for r in retrieval.phrase_search(
            docs, ["window window", "hash join"]
        ).collect()
    }
    assert out == {
        ("window window", 1): (2, 0),
        ("hash join", 2): (2, 0),
    }


def test_phrase_search_rejects_non_bigrams(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        retrieval.phrase_search(docs, ["a b c"])


def test_event_values_fit_ohlc_packed_key():
    """Precondition of the OHLC/funnel lpad keys: every gate corpus has
    0 ≤ value and cents < 10^12 (12-digit lpad) — scanned over every
    /root/testdata/sf* dir the driver could point at."""
    import duckdb

    for d in sorted(glob.glob("/root/testdata/sf*")):
        lo, hi = duckdb.sql(
            f"SELECT min(value), max(value) FROM '{d}/events.parquet'"
        ).fetchone()
        assert lo >= 0 and round(hi * 100) < 10**12, d


def test_ohlc_wide_cents_not_truncated(spark):
    # regression: lpad TRUNCATES inputs wider than the pad, so a
    # 10-digit cents value under the old width-6 key came back as its
    # first 6 digits in open_c/close_c; width 12 must round-trip it
    rows = [
        (1, _ts(9, 15), "u", "t", 12345678.90),  # 1234567890 cents
        (2, _ts(9, 55), "u", "t", 1.00),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    r = temporal.ohlc_bars(ev).collect()[0]
    assert r["open_c"] == 1234567890 and r["close_c"] == 100
    assert r["high_c"] == 1234567890 and r["low_c"] == 100
