"""Split-conformal interval + TextTiling segmentation — engine output
pinned against eager Python references."""

import hashlib
import math
from collections import Counter, defaultdict

from ddaugner_spark.operators.textstats import topic_segments
from ddaugner_spark.operators.traindata import conformal_interval


def test_conformal_matches_python_and_covers(spark, sf_dir):
    row = (
        conformal_interval(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .collect()[0]
        .asDict()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    ).collect()
    cents = [(r["event_id"], r["event_type"], round(r["value"] * 100)) for r in ev]
    sums, cnts = defaultdict(int), defaultdict(int)
    for _, t, c in cents:
        sums[t] += c
        cnts[t] += 1
    means = {t: round(sums[t] / cnts[t]) for t in sums}
    cal, hold = [], []
    for eid, t, c in cents:
        res = abs(c - means[t])
        is_cal = int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16) % 2 == 0
        (cal if is_cal else hold).append(res)
    cal.sort()
    k = min(len(cal), ((len(cal) + 1) * 9 + 9) // 10)
    qhat = cal[k - 1]
    n_in = sum(r <= qhat for r in hold)
    assert row["n_cal"] == len(cal)
    assert row["n_eval"] == len(hold)
    assert row["qhat_c"] == qhat
    assert row["coverage"] == round(n_in / len(hold), 6)
    # the finite-sample guarantee, with small-sample slack
    assert row["coverage"] >= 0.85


def test_topic_segments_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["left_block"]): (r["sim"], r["is_boundary"])
        for r in topic_segments(docs).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        if not r["text"]:
            continue
        toks = r["text"].split(" ")
        blocks = [toks[i : i + 20] for i in range(0, len(toks), 20)]
        for b in range(len(blocks) - 1):
            c1, c2 = Counter(blocks[b]), Counter(blocks[b + 1])
            dot = sum(c1[t] * c2[t] for t in c1)
            n1 = sum(v * v for v in c1.values())
            n2 = sum(v * v for v in c2.values())
            sim = round(dot / math.sqrt(float(n1) * float(n2)), 6)
            want[(r["doc_id"], b)] = (sim, sim < 0.15)
    assert got and got == want


def test_randomized_response_matches_python_and_debiases(spark, sf_dir):
    """Engine output == hashlib replay of the deterministic mechanism;
    the de-biased estimate tracks the true count (the estimator is
    unbiased; the md5 coin is uniform enough for a <10% check here)."""
    from ddaugner_spark.operators.privacy import randomized_response

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: (r["n_true"], r["n_reported"], r["n_est"])
        for r in randomized_response(ev).collect()
    }
    rows = [(r["event_id"], r["event_type"]) for r in ev.select("event_id", "event_type").collect()]
    types = sorted({t for _, t in rows})
    k = len(types)
    idx = {t: i for i, t in enumerate(types)}
    rep = Counter()
    true = Counter()
    for eid, t in rows:
        true[t] += 1
        if int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16) % 4 < 3:
            rep[idx[t]] += 1
        else:
            d = int(hashlib.md5(f"{eid}|lie".encode()).hexdigest()[:4], 16) % (k - 1)
            rep[d + 1 if d >= idx[t] else d] += 1
    n = len(rows)
    for t in types:
        est = round(((k - 1) * 4 * rep[idx[t]] - n * 1) / ((k - 1) * 3 - 1), 6)
        assert got[t] == (true[t], rep[idx[t]], est)
        assert abs(est - true[t]) / true[t] < 0.10
