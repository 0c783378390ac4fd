"""Unit tests for session-12 batch 3: span type-confusion matrix,
cross-lingual bitext candidate mining, and A-priori 3-itemsets."""

from itertools import combinations

from ddaugner_spark.operators import events as evops
from ddaugner_spark.operators import overlap, scoring


SPAN = "doc_id long, sent_id long, start_idx long, end_idx long, tag string"


def test_type_confusion_cells(spark):
    pred = spark.createDataFrame(
        [
            (1, 0, 0, 0, "PER"),  # matches gold PER → diagonal
            (1, 0, 2, 2, "LOC"),  # gold says PER there → (PER, LOC)
            (1, 0, 5, 5, "ORG"),  # spurious → ('O', ORG)
        ],
        SPAN,
    )
    gold = spark.createDataFrame(
        [
            (1, 0, 0, 0, "PER"),
            (1, 0, 2, 2, "PER"),
            (1, 0, 8, 9, "ORG"),  # missed → (ORG, 'O')
        ],
        SPAN,
    )
    out = {
        (r["gold_tag"], r["pred_tag"]): r["n"]
        for r in scoring.type_confusion(pred, gold).collect()
    }
    assert out == {
        ("PER", "PER"): 1,
        ("PER", "LOC"): 1,
        ("O", "ORG"): 1,
        ("ORG", "O"): 1,
    }


def test_bitext_requires_min_shared_and_lang_mismatch(spark):
    docs = spark.createDataFrame(
        [
            # r1/r2 share both rare anchors, different langs → pair
            (1, "common common anchor1 anchor2", "en"),
            (2, "common common anchor1 anchor2", "fr"),
            # r3 shares both with r1 but SAME lang → no pair
            (3, "common anchor1 anchor2", "en"),
            # r4 shares only one anchor with r1 → below min_shared
            (4, "common anchor1 solo", "de"),
            # r5 pushes 'common' over max_df so it can't anchor pairs
            (5, "common", "es"),
        ],
        ["doc_id", "text", "lang"],
    )
    # dfs: common=5 (> max_df, excluded), anchor1=4, anchor2=3, solo=1.
    # Cross-lang pairs sharing ≥2 anchors: (1,2) and (2,3); (1,3)
    # shares both but is same-lang; doc4 shares only anchor1
    out = overlap.bitext_candidates(docs, max_df=4, min_shared=2).collect()
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in out}
    assert got == {(1, 2): 2, (2, 3): 2}


def test_bitext_common_tokens_excluded_by_df(spark):
    # 'common' is in every doc (df=4 > max_df=3) so it never anchors a
    # pair — doc 3/4 share ONLY 'common' and must not pair with anything
    docs = spark.createDataFrame(
        [
            (1, "common a1 a2", "en"),
            (2, "common a1 a2", "fr"),
            (3, "common", "en"),
            (4, "common", "zh"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = overlap.bitext_candidates(docs, max_df=3, min_shared=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(1, 2)}


def _direct_triples(baskets, min_support):
    per = {}
    for bid, items in baskets:
        for tri in combinations(sorted(set(items)), 3):
            per[tri] = per.get(tri, 0) + 1
    return {t: c for t, c in per.items() if c >= min_support}


def test_frequent_triples_matches_direct_enumeration(spark):
    baskets = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c"]),
        (3, ["a", "b", "d"]),
        (4, ["b", "c", "d"]),
        (5, ["a", "b", "c"]),
        (6, ["x", "y", "z"]),  # support-1 triple → dropped
    ]
    rows = [(bid, it) for bid, items in baskets for it in items]
    bk = spark.createDataFrame(rows, ["bid", "item"])
    out = {
        (r["pa"], r["pb"], r["pc"]): r["support"]
        for r in evops.frequent_triples(bk, min_support=2).collect()
    }
    assert out == _direct_triples(baskets, 2)
    assert ("a", "b", "c") in out and out[("a", "b", "c")] == 3


def test_frequent_triples_empty_when_no_support(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (2, "e"), (2, "f")]
    bk = spark.createDataFrame(rows, ["bid", "item"])
    assert evops.frequent_triples(bk, min_support=2).count() == 0
