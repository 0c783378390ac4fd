"""Session-9 operators: common-neighbor link prediction
(graph.link_prediction), deterministic DeepWalk corpus generation
(graph.deterministic_walks), Stupid Backoff trigram scoring
(textstats.stupid_backoff_scores), and per-doc entity salience
(linking.entity_salience).

Each is pinned by fixtures where the right answer is computable by
hand (or by an independent pure-Python replay of the same
deterministic formula), so the DataFrame formulations are verified
against the *semantics*, not against themselves — the repo-wide test
strategy (SURVEY.md §5)."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from ddaugner_spark.operators import graph, linking, textstats


def _edges(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    return spark.createDataFrame(canon, "a string, b string")


# ---------------------------------------------------------------- link pred


def test_link_prediction_path(spark):
    # path a-b-c: only candidate (a, c) through b; deg(b)=2,
    # jaccard = 1 / (1 + 1 - 1) = 1
    out = graph.link_prediction(_edges(spark, [("a", "b"), ("b", "c")]))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["v"], r["w"], r["common"]) == ("a", "c", 1)
    assert r["aa"] == pytest.approx(round(1 / math.log(2), 6))
    assert r["jaccard"] == pytest.approx(1.0)


def test_link_prediction_square(spark):
    # 4-cycle f-g-h-i: diagonals (f,h) and (g,i), each with TWO common
    # neighbors of degree 2
    e = _edges(spark, [("f", "g"), ("g", "h"), ("h", "i"), ("f", "i")])
    got = {(r["v"], r["w"]): r for r in graph.link_prediction(e).collect()}
    assert set(got) == {("f", "h"), ("g", "i")}
    for r in got.values():
        assert r["common"] == 2
        assert r["aa"] == pytest.approx(round(2 / math.log(2), 6))
        assert r["jaccard"] == pytest.approx(1.0)


def test_link_prediction_excludes_existing_edges(spark):
    # K3: every pair is already an edge -> no candidates
    assert graph.link_prediction(
        _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    ).count() == 0


def test_link_prediction_max_deg_hub_guard(spark):
    # star: hub z (deg 4) is the only shared neighbor; max_deg=3 drops it
    star = [("z", f"r{i}") for i in range(4)]
    full = graph.link_prediction(_edges(spark, star))
    assert full.count() == 6  # C(4,2) rim pairs
    aa = full.select("aa").distinct().collect()[0][0]
    assert aa == pytest.approx(round(1 / math.log(4), 6))
    assert graph.link_prediction(_edges(spark, star), max_deg=3).count() == 0


# -------------------------------------------------------------------- walks


def _expected_walks(adj, length, walks_per_seed):
    """Pure-Python replay of the deterministic next-hop rule."""
    nbrs = {}
    for s, d in sorted(set(adj)):
        nbrs.setdefault(s, []).append(d)
    out = set()
    for seed in sorted({s for s, _ in adj}):
        for r in range(walks_per_seed):
            wid = f"{seed}#{r}"
            node = seed
            out.add((wid, 0, node))
            for t in range(1, length + 1):
                nb = nbrs.get(node)
                if not nb:
                    break
                h = int(hashlib.md5(f"{wid}|{t}".encode()).hexdigest()[:4], 16)
                node = nb[h % len(nb)]
                out.add((wid, t, node))
    return out


def test_walks_match_python_replay(spark):
    adj = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("b", "a"),
        ("c", "d"),  # d is a sink: walks reaching it end early
    ]
    df = spark.createDataFrame(adj, "src string, dst string")
    got = {
        (r["walk_id"], r["step"], r["node"])
        for r in graph.deterministic_walks(df, length=3, walks_per_seed=2).collect()
    }
    assert got == _expected_walks(adj, 3, 2)


def test_walks_are_repartition_invariant(spark):
    adj = [(f"n{i}", f"n{(i * 3 + 1) % 7}") for i in range(7)] + [
        (f"n{i}", f"n{(i + 2) % 7}") for i in range(7)
    ]
    df = spark.createDataFrame(adj, "src string, dst string")
    a = {
        tuple(r)
        for r in graph.deterministic_walks(df, length=2).collect()
    }
    b = {
        tuple(r)
        for r in graph.deterministic_walks(df.repartition(7), length=2).collect()
    }
    assert a == b


# ----------------------------------------------------------- stupid backoff


def test_stupid_backoff_levels_and_scores(spark):
    # corpus: "x y z x y w" + "y z q"
    docs = spark.createDataFrame(
        [(0, "x y z x y w"), (1, "y z q")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"], r["w3"]): (r["level"], r["score"])
        for r in textstats.stupid_backoff_scores(docs).collect()
    }
    # observed trigram (x,y,z): c3=1, c12=c(x y)=2 -> level 3, 0.5
    assert out[("x", "y", "z")] == (3, 0.5)
    # corrupted (x,y,x): unseen trigram, unseen bigram (y,x) ->
    # level 1, 0.4^2 * c(x)/N, N=9 tokens, c(x)=2
    lvl, score = out[("x", "y", "x")]
    assert lvl == 1
    assert score == pytest.approx(round(0.4 * 0.4 * 2 / 9, 6))
    # corrupted (y,z,y): bigram (z,y) unseen? z->x and z->q seen only ->
    # level 1; c(y)=3
    assert out[("y", "z", "y")][0] == 1
    # corrupted (z,x,z) is absent (its context (z,x) IS observed; probe set
    # includes it): trigram (z,x,z) unseen, bigram (x,z) unseen -> level 1
    lvl, score = out[("z", "x", "z")]
    assert lvl == 1
    assert score == pytest.approx(round(0.16 * 2 / 9, 6))
    # every observed trigram scores at level 3
    for (w1, w2, w3), (lvl, _) in out.items():
        if w3 != w1:
            assert lvl == 3


def test_stupid_backoff_level2_branch(spark):
    # "a b a" makes corrupted twin (a,b,a) = the observed trigram itself;
    # craft instead: "p q r" + "q p s" -> corrupted (p,q,p): trigram unseen,
    # but bigram (q,p) IS observed -> level 2, 0.4 * c(q p)/c(q)
    docs = spark.createDataFrame(
        [(0, "p q r"), (1, "q p s")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"], r["w3"]): (r["level"], r["score"])
        for r in textstats.stupid_backoff_scores(docs).collect()
    }
    lvl, score = out[("p", "q", "p")]
    assert lvl == 2
    assert score == pytest.approx(round(0.4 * 1 / 2, 6))


# ----------------------------------------------------------------- salience


def test_entity_salience_fixture(spark):
    ments = spark.createDataFrame(
        [
            (1, 0, "Alice"), (1, 0, "Bob"), (1, 2, "Alice"), (1, 5, "Carol"),
            (2, 3, "Dave"),
        ],
        "doc_id long, sent_id long, surface string",
    )
    got = {
        (r["doc_id"], r["surface"]): r
        for r in linking.entity_salience(ments).collect()
    }
    # doc 1: 4 mentions total; Alice cnt=2 first_sent=0 -> (2/4)/1 = 0.5
    assert got[(1, "Alice")]["salience"] == pytest.approx(0.5)
    assert got[(1, "Alice")]["cnt"] == 2
    # Bob: (1/4)/(1+0) = 0.25 ; Carol: (1/4)/(1+5) -> 0.041667
    assert got[(1, "Bob")]["salience"] == pytest.approx(0.25)
    assert got[(1, "Carol")]["salience"] == pytest.approx(round(0.25 / 6, 6))
    # single-mention doc: salience = 1/(1+first_sent)
    assert got[(2, "Dave")]["salience"] == pytest.approx(0.25)
    assert got[(2, "Dave")]["first_sent"] == 3
