"""LSH bucket-cap hygiene."""

import pyspark.sql.functions as F

from ddaugner_spark.operators import dedup


def test_lsh_bucket_cap(spark, docs):
    corpus = dedup.with_dup_corpus(docs)
    bands = dedup.lsh_bands(dedup.minhash_signatures(dedup.shingles(corpus)))
    uncapped = dedup.lsh_candidate_pairs(bands).count()
    capped = dedup.lsh_candidate_pairs(bands, max_bucket_size=2).count()
    # cap removes degenerate buckets, never adds pairs
    assert capped <= uncapped
    # exact-duplicate pairs live in 2-member buckets and must survive
    survivors = {
        (r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(bands, max_bucket_size=2).collect()
    }
    exact_ids = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 20 == 0).collect()]
    kept = sum((i, i + 1_000_000) in survivors for i in exact_ids)
    assert kept > 0


def test_jaccard_inverted_superset_of_lsh(spark, docs):
    """The exact inverted-index Jaccard pairs are ground truth: every
    MinHash+LSH near-dup pair (already exact-verified above the same
    threshold) must appear in them, and every exact pair's jaccard must
    clear the threshold."""
    corpus = dedup.with_dup_corpus(docs)
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.jaccard_pairs_inverted(corpus).collect()
    }
    lsh = {
        (r["a"], r["b"]) for r in dedup.minhash_near_duplicates(corpus).collect()
    }
    assert lsh <= set(exact), lsh - set(exact)
    assert exact, "exact pass found no near-dups on the dup corpus"
    assert all(j >= 0.5 for j in exact.values())


def test_jaccard_inverted_doc_freq_cap(spark, docs):
    """The stop-shingle cap only ever removes pairs (bounded fan-out),
    and identical docs stay at jaccard 1.0 without a cap in play."""
    corpus = dedup.with_dup_corpus(docs)
    uncapped = dedup.jaccard_pairs_inverted(corpus)
    capped = dedup.jaccard_pairs_inverted(corpus, max_doc_freq=3)
    assert capped.count() <= uncapped.count()
    ones = {
        (r["a"], r["b"])
        for r in uncapped.filter(F.col("jaccard") == 1.0).collect()
    }
    exact_ids = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 20 == 0).collect()]
    assert any((i, i + 1_000_000) in ones for i in exact_ids)


# ---------------------------------------------------------------------------
# intra-doc repeated n-gram removal
# ---------------------------------------------------------------------------

import hashlib


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _rep(spark, rows, n=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in
            dedup.repeated_ngram_stats(df, n=n).collect()}


def test_repeated_ngram_basic(spark):
    got = _rep(spark, [(1, "a b c a b c d")])[1]
    # the second 'a b c' (pos 4) is the only repeat; its 3 tokens go
    assert (got["n_tokens"], got["n_repeated"], got["n_masked"]) == (7, 1, 3)
    assert got["clean_hash"] == _md5("a b c d")


def test_repeated_ngram_overlapping_runs(spark):
    got = _rep(spark, [(1, "a a a a a")])[1]
    # grams at pos 1..3 are all 'a a a'; pos 2,3 repeat -> mask {2,3,4,5}
    assert (got["n_repeated"], got["n_masked"]) == (2, 4)
    assert got["clean_hash"] == _md5("a")


def test_repeated_ngram_clean_doc_untouched(spark):
    got = _rep(spark, [(1, "w x y z")])[1]
    assert (got["n_repeated"], got["n_masked"]) == (0, 0)
    assert got["clean_hash"] == _md5("w x y z")


def test_repeated_ngram_short_and_empty_docs(spark):
    got = _rep(spark, [(1, "a b"), (2, ""), (3, None)])
    assert got[1]["n_tokens"] == 2 and got[1]["clean_hash"] == _md5("a b")
    # split('') is [''] — one empty token, reconstructs to ''
    for d in (2, 3):
        assert got[d]["n_tokens"] == 1
        assert got[d]["clean_hash"] == _md5("")


def test_repeated_ngram_first_occurrence_never_masked(spark):
    # every doc keeps position 1 by construction; heavy repetition
    # still leaves the first gram intact
    got = _rep(spark, [(1, "p q r p q r p q r p q r")])[1]
    assert got["clean_hash"] == _md5("p q r")
    assert got["n_masked"] == got["n_tokens"] - 3
