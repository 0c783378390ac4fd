"""Session-9 batch 3: transitive ancestor closure by repeated squaring
(graph.ancestor_closure), PSL registrable-domain extraction
(crawl.registrable_domains), SumBasic extractive summarization
(textstats.extractive_summary)."""

import pytest

from ddaugner_spark.operators import crawl, graph, textstats


def test_ancestor_closure_chain(spark):
    # chain a->b->c->d: closure has 3+2+1 pairs with exact depths
    p = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "node string, parent string"
    )
    got = {(r["node"], r["anc"]): r["depth"] for r in
           graph.ancestor_closure(p, max_depth=8).collect()}
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2,
        ("a", "d"): 3,
    }


def test_ancestor_closure_tree_and_depth_cap(spark):
    # balanced binary-ish tree; max_depth=2 truncates deep ancestors
    p = spark.createDataFrame(
        [("l1", "root"), ("l2", "root"), ("l11", "l1"), ("l111", "l11")],
        "node string, parent string",
    )
    full = {(r["node"], r["anc"]): r["depth"] for r in
            graph.ancestor_closure(p, max_depth=8).collect()}
    assert full[("l111", "root")] == 3
    capped = {(r["node"], r["anc"]) for r in
              graph.ancestor_closure(p, max_depth=2).collect()}
    assert ("l111", "root") not in capped
    assert ("l111", "l1") in capped


def test_registrable_domains_longest_match(spark):
    hosts = spark.createDataFrame(
        [("www.example.co.uk",), ("example.co.uk",), ("a.b.example.com",),
         ("example.io",), ("weird.unknowntld",), ("co.uk",)],
        "host string",
    )
    got = {r["host"]: (r["public_suffix"], r["registrable"]) for r in
           crawl.registrable_domains(hosts).collect()}
    # co.uk beats uk (longest match)
    assert got["www.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    # deep subdomains reduce to label+suffix
    assert got["a.b.example.com"] == ("com", "example.com")
    assert got["example.io"] == ("io", "example.io")
    # unknown TLD -> dropped entirely (not registrable)
    assert "weird.unknowntld" not in got
    # a bare public suffix has no registrable label
    assert got["co.uk"] == ("co.uk", None)


def test_extractive_summary_picks_high_frequency_sentence(spark):
    # corpus frequencies: 'x' appears 5 times, rare words once each.
    # doc 0 sentence 1 (all x) must win; doc 1 single sentence wins trivially
    docs = spark.createDataFrame(
        [(0, "q w the x x x the r t"), (1, "x x y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.extractive_summary(docs).collect()}
    assert got[0]["best_sent"] == 1
    assert got[0]["n_toks"] == 4  # 'x x x the'
    assert got[1]["best_sent"] == 0


def test_extractive_summary_tie_breaks_earliest(spark):
    # two identical sentences -> same score, earliest sent_id wins
    docs = spark.createDataFrame(
        [(0, "a b the a b the")], "doc_id long, text string"
    )
    out = textstats.extractive_summary(docs).collect()
    assert len(out) == 1 and out[0]["best_sent"] == 0
