"""Wilson lower-bound ranking + difference-in-differences — engine
output pinned against eager Python references on the gate tables."""

import math
from collections import defaultdict

import pyspark.sql.functions as F

from ddaugner_spark.operators.stats import did_effect, wilson_rates


def _py_lb(n_ret, n, z=1.96):
    p = n_ret / n
    return round(
        (p + z * z / (2.0 * n) - z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)))
        / (1.0 + z * z / n),
        6,
    )


def test_wilson_rates_matches_python_and_shrinks(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = [
        (r["l_partkey"], r["n"], r["n_ret"], r["rate"], r["lb"])
        for r in wilson_rates(li).collect()
    ]
    assert len(got) == 20
    agg = {
        r["l_partkey"]: (r["n"], r["n_ret"])
        for r in li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_ret"),
        )
        .collect()
    }
    ranked = sorted(
        ((_py_lb(x, n), pk, n, x) for pk, (n, x) in agg.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want = [(pk, n, x, round(x / n, 6), lb) for lb, pk, n, x in ranked]
    assert got == want
    # the lower bound actually lower-bounds (strictly, for 0 < p < 1)
    for _pk, n, x, rate, lb in got:
        assert lb <= rate
        if 0 < x < n:
            assert lb < rate


def test_did_effect_matches_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = did_effect(ev).collect()[0]
    s = defaultdict(int)
    users = defaultdict(set)
    for r in ev.select("user_id", "event_type", "ts").collect():
        t = int(r["user_id"] % 2 == 1)
        p = int(str(r["ts"]) >= "2024-01-16")
        users[t].add(r["user_id"])
        if r["event_type"] == "purchase":
            s[(t, p)] += 1
    m = {tp: s[tp] / len(users[tp[0]]) for tp in [(0, 0), (0, 1), (1, 0), (1, 1)]}
    assert row["pre_ctrl"] == round(m[(0, 0)], 6)
    assert row["post_ctrl"] == round(m[(0, 1)], 6)
    assert row["pre_treat"] == round(m[(1, 0)], 6)
    assert row["post_treat"] == round(m[(1, 1)], 6)
    assert row["did"] == round(
        (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)]), 6
    )


def test_eb_shrunk_rates_matches_python_and_shrinks(spark, sf_dir):
    """Bit-exact vs the eager MoM reference; shrinkage property: every
    group's shrunk rate sits between its raw rate and the prior mean,
    and small-n groups move proportionally more."""
    from ddaugner_spark.operators.stats import eb_shrunk_rates

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_partkey"]: (r["n"], r["x"], r["rate"], r["shrunk"])
        for r in eb_shrunk_rates(li).collect()
    }
    agg = {
        r["l_partkey"]: (r["n"], r["x"])
        for r in li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("x"),
        )
        .collect()
    }
    qs = {pk: round(x / n * 1000000.0) for pk, (n, x) in agg.items()}
    k = len(qs)
    s1, s2 = sum(qs.values()), sum(q * q for q in qs.values())
    m = s1 / k / 1000000.0
    msq = s2 / k / 1000000000000.0
    v = max(msq - m * m, 1e-12)
    s = max(m * (1.0 - m) / v - 1.0, 0.0)
    want = {
        pk: (n, x, round(x / n, 6), round((x + m * s) / (n + s), 6))
        for pk, (n, x) in agg.items()
    }
    assert got == want and s > 0
    for n, x, rate, shrunk in got.values():
        lo, hi = sorted((rate, round(m, 6)))
        assert lo - 1e-6 <= shrunk <= hi + 1e-6
