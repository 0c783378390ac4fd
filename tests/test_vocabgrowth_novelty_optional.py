"""Unit tests for session-12 batch 7: vocabulary saturation curve,
n-gram novelty, SPARQL OPTIONAL/NOT-EXISTS pattern."""

import glob
import re

from ddaugner_spark.operators import kgquery, textstats


def test_vocab_growth_curve(spark):
    docs = spark.createDataFrame(
        [
            (1, "src0", "a b c"),
            (2, "src0", "a b"),
            (3, "src1", "a d"),     # contributes only 'd'
            (4, "src2", "a b c d"), # contributes nothing new
        ],
        ["doc_id", "source", "text"],
    )
    out = {r["src_idx"]: r for r in textstats.vocab_growth(docs).collect()}
    assert out[0]["new_tokens"] == 3 and out[0]["vocab_cum"] == 3
    assert out[1]["new_tokens"] == 1 and out[1]["vocab_cum"] == 4
    assert out[2]["new_tokens"] == 0 and out[2]["vocab_cum"] == 4
    assert out[2]["n_docs_cum"] == 4


def test_vocab_growth_source_contract_holds_on_gate_corpora():
    """vocab_growth parses src<N>; pin that every gate corpus obeys."""
    import duckdb

    for d in sorted(glob.glob("/root/testdata/sf*")):
        srcs = [
            r[0]
            for r in duckdb.sql(
                f"SELECT DISTINCT source FROM '{d}/documents.parquet'"
            ).fetchall()
        ]
        assert srcs and all(re.fullmatch(r"src\d+", s) for s in srcs), d


def test_ngram_novelty_rates(spark):
    # train doc 0 has the only seen 5-gram; eval doc 1 repeats it
    # (novelty 0), eval doc 3 is all-new (novelty 1)
    docs = spark.createDataFrame(
        [
            (0, "a b c d e", "en"),
            (1, "a b c d e", "en"),
            (3, "v w x y z", "fr"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r["lang"]: r for r in
           textstats.ngram_novelty(docs, k=5).collect()}
    assert out["en"]["n_ngrams"] == 1 and out["en"]["n_novel"] == 0
    assert out["en"]["novelty"] == 0.0
    assert out["fr"]["n_novel"] == 1 and out["fr"]["novelty"] == 1.0


def test_optional_pattern_branches(spark):
    tri = spark.createDataFrame(
        [
            ("s1", "req", "o1"),   # req + opt + no neg → bound row
            ("s1", "opt", "z1"),
            ("s1", "opt", "z2"),
            ("s2", "req", "o2"),   # req only → NULL optional
            ("s3", "req", "o3"),   # excluded by NOT EXISTS
            ("s3", "neg", "w"),
        ],
        ["subj", "pred", "obj"],
    )
    out = {r["x"]: r for r in
           kgquery.optional_pattern(tri, "req", "opt", "neg").collect()}
    assert set(out) == {"s1", "s2"}
    assert out["s1"]["z_min"] == "z1" and out["s1"]["n_z"] == 2
    assert out["s2"]["z_min"] is None and out["s2"]["n_z"] == 0
