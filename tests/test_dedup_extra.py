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
