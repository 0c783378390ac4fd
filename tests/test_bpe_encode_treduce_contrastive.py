"""Unit tests for session-12 batch 5: BPE encode, transitive
reduction, contrastive pair mining."""

from ddaugner_spark.operators import bpe, graph, traindata


def test_bpe_encode_segments_and_preserves_word(spark):
    # vocab heavily favors 'ab': merges learn (a,b) first
    vocab = spark.createDataFrame(
        [("abab", 10), ("abc", 5), ("xy", 1)], ["token", "n"]
    )
    out = {r["word"]: r for r in bpe.bpe_encode(vocab, n_merges=2).collect()}
    for w, r in out.items():
        assert r["encoded"].replace(" ", "") == w  # lossless segmentation
        assert r["n_symbols"] == len(r["encoded"].split(" "))
    assert out["abab"]["encoded"] in {"abab", "ab ab"}
    # 'ab' merge must have been learned (count 25 dominates)
    assert out["abc"]["n_symbols"] <= 2


def test_bpe_encode_greedy_leftmost(spark):
    # 'aaa' with merge (a,a): leftmost pair merges, no cascade in-step
    vocab = spark.createDataFrame([("aaa", 10)], ["token", "n"])
    r = bpe.bpe_encode(vocab, n_merges=1).collect()[0]
    assert r["encoded"] == "aa a"


def test_transitive_reduction_diamond(spark):
    # a→b→d, a→c→d plus the redundant shortcut a→d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("a", "d")],
        ["src", "dst"],
    )
    kept = {(r["src"], r["dst"]) for r in
            graph.transitive_reduction(edges).collect()}
    assert kept == {("a", "b"), ("b", "d"), ("a", "c"), ("c", "d")}


def test_transitive_reduction_keeps_minimal_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    assert graph.transitive_reduction(edges).count() == 3


def test_contrastive_pairs_structure(spark):
    # 3 docs of 80 tokens → chunk starts 0/32/64: chunks 0 (64 tok),
    # 1 (48 tok), 2 (16 tok)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 80)) for i in (1, 2, 3)], ["doc_id", "text"]
    )
    out = {(r["doc_id"], r["chunk_id"]): r for r in
           traindata.contrastive_pairs(docs).collect()}
    # anchors need a successor chunk (so not chunk 2) AND a next doc at
    # the same position (so not doc 3)
    assert set(out) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    r = out[(1, 0)]
    assert r["pos_chunk_id"] == 1 and r["neg_doc_id"] == 2
    assert r["anchor_tokens"] == 64 and r["pos_tokens"] == 48
    assert r["neg_tokens"] == 64  # same chunk position in the next doc
    r11 = out[(1, 1)]
    assert r11["pos_tokens"] == 16 and r11["neg_doc_id"] == 2
