"""Round-5 session-10 batch 5: Fleiss' kappa, rich-club coefficients,
query-likelihood Dirichlet ranking, watermark-lateness audit.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_fleiss_kappa, q_rich_club,
q_ql_rank, q_lateness).
"""

import datetime as dt
import math

from ddaugner_spark.operators.graph import rich_club
from ddaugner_spark.operators.retrieval import ql_dirichlet
from ddaugner_spark.operators.scoring import fleiss_kappa
from ddaugner_spark.operators.temporal import lateness_audit


def test_fleiss_kappa_perfect_agreement(spark):
    rows = [(i, c) for i in range(5) for c in ["A"] * 3]
    r = fleiss_kappa(
        spark.createDataFrame(rows, ["item", "cat"]), ["item"], "cat"
    ).collect()[0]
    # every item unanimous in one category -> P_e = 1 -> sentinel
    assert (r.n_items, r.n_raters, r.balanced) == (5, 3, True)
    assert r.kappa == -9.9


def test_fleiss_kappa_hand_value(spark):
    # 2 items, 2 raters: item 0 agrees (A, A), item 1 splits (A, B)
    # P_i: item0 = 1, item1 = 0 -> P_bar = 1/2
    # marginals: A 3/4, B 1/4 -> P_e = 9/16 + 1/16 = 5/8
    # kappa = (1/2 - 5/8)/(1 - 5/8) = -1/3
    rows = [(0, "A"), (0, "A"), (1, "A"), (1, "B")]
    r = fleiss_kappa(
        spark.createDataFrame(rows, ["item", "cat"]), ["item"], "cat"
    ).collect()[0]
    assert r.p_bar == 0.5 and r.p_e == 0.625
    assert r.kappa == round(-1 / 3, 6)
    assert r.balanced


def test_fleiss_kappa_unbalanced_flagged(spark):
    rows = [(0, "A"), (0, "A"), (1, "A")]
    r = fleiss_kappa(
        spark.createDataFrame(rows, ["item", "cat"]), ["item"], "cat"
    ).collect()[0]
    assert not r.balanced


def test_rich_club_star_plus_clique(spark):
    # triangle a-b-c (degrees 2 within) with pendant d-a:
    # degrees: a=3, b=2, c=2, d=1
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")], ["a", "b"]
    )
    out = {r.k: r for r in rich_club(edges, ks=(1, 2, 3)).collect()}
    # k=1: nodes {a,b,c} (deg>1), edges among them 3 -> phi = 1
    assert (out[1].n_nodes, out[1].n_edges, out[1].phi) == (3, 3, 1.0)
    # k=2: only a -> sentinel
    assert (out[2].n_nodes, out[2].phi) == (1, -1.0)
    assert (out[3].n_nodes, out[3].phi) == (0, -1.0)


def test_ql_dirichlet_ranking(spark):
    docs = spark.createDataFrame(
        [
            (0, "x x x x"),          # no query terms
            (1, "q x x x"),          # tf 1, len 4
            (2, "q q x x"),          # tf 2, len 4
            (3, "q"),                # tf 1, len 1 (highest density)
        ],
        ["doc_id", "text"],
    )
    out = ql_dirichlet(docs, ["q"], mu=10, k=4).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [3, 2, 1, 0]
    r3 = next(r for r in out if r.doc_id == 3)
    # cf(q)=4, |C|=13: score = ln((1 + 10*4/13)/(1 + 10))
    assert r3.score == round(math.log((1 + 10 * 4 / 13) / 11), 6)


def test_lateness_audit_counts(spark):
    base = dt.datetime(2024, 1, 1)
    # arrival order 0..3; event 2 arrives 2h behind the running max,
    # event 3 only 30min behind
    rows = [
        (0, base + dt.timedelta(hours=0)),
        (1, base + dt.timedelta(hours=3)),
        (2, base + dt.timedelta(hours=1)),
        (3, base + dt.timedelta(hours=2, minutes=30)),
    ]
    ev = spark.createDataFrame(
        [(i, ts, 1, "e", 1.0, "{}") for i, ts in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    r = lateness_audit(ev, watermark_s=3600).collect()[0]
    assert (r.n, r.n_late, r.n_dropped) == (4, 2, 1)
    assert r.max_lateness_s == 7200


def test_lateness_audit_per_partition_watermark(spark):
    # watermarks are per source partition: p1's events arrive in-order
    # within p1, so they are not late against p1's own running max even
    # though p0 has already seen a much later event time
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("p0", 0, base + dt.timedelta(hours=10)),
        ("p1", 1, base + dt.timedelta(hours=0)),
        ("p1", 2, base + dt.timedelta(hours=1)),
    ]
    ev = spark.createDataFrame(
        [(p, i, ts, 1, "e", 1.0, "{}") for p, i, ts in rows],
        ["part", "event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    g = lateness_audit(ev, watermark_s=3600).collect()[0]
    assert (g.n, g.n_late, g.n_dropped, g.max_lateness_s) == (3, 2, 2, 36000)
    p = lateness_audit(ev, watermark_s=3600, ingest_partition="part").collect()[0]
    assert (p.n, p.n_late, p.n_dropped, p.max_lateness_s) == (3, 0, 0, 0)
