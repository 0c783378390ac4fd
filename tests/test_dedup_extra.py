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
