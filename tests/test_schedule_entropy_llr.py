"""Session-9 batch 5: crawl scheduling (crawl.crawl_schedule), token
entropy (textstats.token_entropy), Dunning LLR phrases
(textstats.phrase_llr), WoW anomaly (events.wow_counts), JSON key
profiling (events.json_key_profile)."""

import datetime as dt
import math

import pytest

from ddaugner_spark.operators import crawl, textstats
from ddaugner_spark.operators import events as evops


def test_crawl_schedule_estimator(spark):
    # host A: changes every capture (X=n); host B: never changes (X=0);
    # host C: one capture (n=0)
    rows = (
        [("A", d, f"a{d}") for d in range(5)]
        + [("B", d, "same") for d in range(5)]
        + [("C", 0, "c")]
    )
    caps = spark.createDataFrame(rows, "host string, day long, content_hash string")
    got = {r["host"]: r for r in crawl.crawl_schedule(caps).collect()}
    a = got["A"]
    assert (a["n_intervals"], a["n_changes"]) == (4, 4)
    lam = -math.log(0.5 / 4.5)
    assert a["change_rate"] == pytest.approx(round(lam, 6))
    assert a["crawl_interval"] == pytest.approx(round(1 / lam, 6))
    b = got["B"]
    assert (b["n_intervals"], b["n_changes"]) == (4, 0)
    assert b["change_rate"] == pytest.approx(round(-math.log(4.5 / 4.5), 6))
    assert b["crawl_interval"] is None  # unbounded, not infinity
    c = got["C"]
    assert c["n_intervals"] == 0 and c["change_rate"] is None


def test_token_entropy_extremes(spark):
    docs = spark.createDataFrame(
        [(0, "a a a a", "mono"), (1, "a b c d", "uni")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in textstats.token_entropy(docs).collect()}
    assert got["mono"]["entropy"] == pytest.approx(0.0)  # single symbol
    assert got["uni"]["entropy"] == pytest.approx(round(math.log(4), 6))
    assert got["uni"]["n_tokens"] == 4


def _llr(k11, r1, c1, n):
    def s(x):
        return x * math.log(x) if x > 0 else 0.0

    k12, k21, k22 = r1 - k11, c1 - k11, n - r1 - c1 + k11
    return 2.0 * (
        s(k11) + s(k12) + s(k21) + s(k22)
        - s(r1) - s(n - r1) - s(c1) - s(n - c1) + s(n)
    )


def test_phrase_llr_matches_python(spark):
    # 'x y' always together (strong phrase), 'a b' independent-ish
    text = " ".join(["x y a"] * 5 + ["b a"] * 5)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["c12"], r["llr"])
           for r in textstats.phrase_llr(docs, min_count=5).collect()}
    # recompute marginals from the bigram multiset
    from collections import Counter

    toks = text.split(" ")
    bg = Counter(zip(toks, toks[1:]))
    n = sum(bg.values())
    r1 = Counter()
    c1 = Counter()
    for (w1, w2), c in bg.items():
        r1[w1] += c
        c1[w2] += c
    for (w1, w2), (c12, llr) in got.items():
        assert bg[(w1, w2)] == c12 and c12 >= 5
        assert llr == pytest.approx(
            round(_llr(c12, r1[w1], c1[w2], n), 4), abs=1e-3
        )
    assert ("x", "y") in got
    # the always-together pair is more surprising than the mixed one
    assert got[("x", "y")][1] > got[("a", "b")][1] if ("a", "b") in got else True


def test_wow_counts_flags_spikes(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 'view' events on day 0, 12 on day 7 (4x -> anomaly)
    for _ in range(3):
        rows.append((eid, base, 1, "view")); eid += 1
    for _ in range(12):
        rows.append((eid, base + dt.timedelta(days=7), 1, "view")); eid += 1
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {r["day"]: r for r in evops.wow_counts(e).collect()}
    d0 = got["2024-01-01"]
    assert (d0["prev_cnt"], d0["wow"], d0["anomaly"]) == (-1, -1.0, False)
    d7 = got["2024-01-08"]
    assert (d7["cnt"], d7["prev_cnt"]) == (12, 3)
    assert d7["wow"] == pytest.approx(4.0) and d7["anomaly"] is True


def test_json_key_profile(spark):
    df = spark.createDataFrame(
        [('{"k": 1, "tag": "a"}',), ('{"k": 2}',), ('{"tag": "a"}',),
         ('{"k": -7, "tag": "b"}',)],
        "j string",
    )
    got = {r["key"]: r for r in
           evops.json_key_profile(df, "j", ["k", "tag", "zz"]).collect()}
    k = got["k"]
    assert (k["n_present"], k["n_numeric"], k["n_distinct"]) == (3, 3, 3)
    t = got["tag"]
    assert (t["n_present"], t["n_numeric"], t["n_distinct"]) == (3, 0, 2)
    z = got["zz"]
    assert (z["n_present"], z["n_numeric"], z["n_distinct"]) == (0, 0, 0)
