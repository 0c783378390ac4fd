"""Round-5 session-10 batch 4: bounded Kleene property path, crawl
link audit, multi-touch attribution.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_kleene_path, q_link_audit,
q_attribution).
"""

import datetime as dt

from ddaugner_spark.operators.crawl import extract_links, link_audit
from ddaugner_spark.operators.events import multi_touch_attribution
from ddaugner_spark.operators.kgquery import kleene_path


def _tri(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_kleene_min_depth_and_bound(spark):
    # a -p1-> x ; x -s-> y -s-> z ; x -p3-> t0, y -p3-> t1, z -p3-> t2
    # plus a shortcut x -s-> z (so z reachable at depth 1 and 2)
    rows = [
        ("a", "p1", "x"),
        ("x", "s", "y"), ("y", "s", "z"), ("x", "s", "z"),
        ("x", "p3", "t0"), ("y", "p3", "t1"), ("z", "p3", "t2"),
        ("z", "s", "w"), ("w", "s", "v"), ("v", "p3", "t9"),
    ]
    out = {
        (r.subj, r.obj): r.star_depth
        for r in kleene_path(_tri(spark, rows), "p1", "s", "p3", 3).collect()
    }
    assert out[("a", "t0")] == 0       # zero star hops
    assert out[("a", "t1")] == 1
    assert out[("a", "t2")] == 1       # shortcut wins over depth 2
    # v is 4 star hops via y->z->w->v but 3 via z->w->v (shortcut)
    assert out[("a", "t9")] == 3
    # the star bound prunes anything needing > max_star hops
    assert (
        ("a", "t9")
        not in {
            (r.subj, r.obj)
            for r in kleene_path(
                _tri(spark, rows), "p1", "s", "p3", 2
            ).collect()
        }
    )


def test_kleene_diamond_no_double_count(spark):
    rows = [
        ("a", "p1", "x"),
        ("x", "s", "m1"), ("x", "s", "m2"),
        ("m1", "s", "z"), ("m2", "s", "z"),
        ("z", "p3", "t"),
    ]
    out = kleene_path(_tri(spark, rows), "p1", "s", "p3", 3).collect()
    hits = [r for r in out if (r.subj, r.obj) == ("a", "t")]
    assert len(hits) == 1 and hits[0].star_depth == 2


def _pages(spark, rows):
    """rows: (url, html)."""
    import pyspark.sql.functions as F

    return spark.createDataFrame(rows, ["url", "h"]).select(
        "url", F.encode("h", "UTF-8").alias("html")
    )


def test_link_audit_kinds(spark):
    pages = _pages(
        spark,
        [
            ("https://a.example.com/doc/1",
             '<a href="https://a.example.com/doc/2">x</a>'),   # resolved
            ("https://a.example.com/doc/2",
             '<a href="https://b.example.com/doc/1">x</a>'
             '<a href="https://a.example.com/doc/99">x</a>'),  # mismatch + dangling
            ("https://c.example.com/doc/3", "no links"),       # orphan
        ],
    )
    out = {r.kind: r.n for r in link_audit(pages, extract_links(pages)).collect()}
    assert out["resolved_link"] == 1
    assert out["host_mismatch_link"] == 1  # doc/1 exists on host a, not b
    assert out["dangling_link"] == 1       # doc/99 nowhere
    # doc/3 never referenced by any link path; doc/1 IS referenced (via b)
    assert out["orphan_page"] == 1


def _ev(spark, rows):
    """rows: (event_id, user, hour, type, value)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=h), u, t, float(v), "{}")
            for i, u, h, t, v in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_attribution_u_shape(spark):
    # user 1: 4 touches then a 100.00 purchase ->
    # first (click) 40%, last (click) 40%, middles (view, view) 10% each
    rows = [
        (1, 1, 0, "click", 0.0),
        (2, 1, 1, "view", 0.0),
        (3, 1, 2, "view", 0.0),
        (4, 1, 3, "click", 0.0),
        (5, 1, 4, "purchase", 100.0),
    ]
    out = {r.channel: r for r in multi_touch_attribution(_ev(spark, rows)).collect()}
    assert out["click"].credited == 80.0 and out["click"].n_touchpoints == 2
    assert out["view"].credited == 20.0 and out["view"].n_touchpoints == 2
    assert "direct" not in out


def test_attribution_edge_counts_and_direct(spark):
    # user 1: single touch takes 100%; user 2: no touches -> direct;
    # user 3: touch outside the 72h window -> direct
    rows = [
        (1, 1, 0, "view", 0.0),
        (2, 1, 1, "purchase", 50.0),
        (3, 2, 0, "purchase", 30.0),
        (4, 3, 0, "click", 0.0),
        (5, 3, 100, "purchase", 20.0),
    ]
    out = {r.channel: r for r in multi_touch_attribution(_ev(spark, rows)).collect()}
    assert out["view"].credited == 50.0
    assert out["direct"].credited == 50.0  # 30 + 20
    assert out["direct"].n_touchpoints == 0


def test_attribution_two_touches_split_evenly(spark):
    rows = [
        (1, 1, 0, "click", 0.0),
        (2, 1, 1, "view", 0.0),
        (3, 1, 2, "purchase", 10.0),
    ]
    out = {r.channel: r.credited for r in multi_touch_attribution(_ev(spark, rows)).collect()}
    assert out == {"click": 5.0, "view": 5.0}
