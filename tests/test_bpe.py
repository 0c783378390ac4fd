"""BPE merge training (operators/bpe.py)."""

from pyspark.sql import functions as F

from ddaugner_spark.operators import bpe


def _vocab(spark, items):
    return spark.createDataFrame(items, ["token", "n"])


def test_apply_merge_leftmost_no_overlap(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], ["toks"])
    out = df.select(bpe.apply_merge(F.col("toks"), "a", "a").alias("m")).collect()
    # greedy leftmost, non-overlapping: aaa -> [aa, a], no cascade
    assert out[0].m == ["aa", "a"]


def test_apply_merge_no_cascade_with_merged_symbol(spark):
    df = spark.createDataFrame([(["x", "y", "y"],)], ["toks"])
    out = df.select(bpe.apply_merge(F.col("toks"), "x", "y").alias("m")).collect()
    # xy is formed, then ("xy","y") is NOT the merge being applied
    assert out[0].m == ["xy", "y"]


def test_bpe_train_hand_merges_and_early_stop(spark):
    v = _vocab(spark, [("abab", 2), ("ab", 3)])
    rows = bpe.bpe_train(v, n_merges=5).collect()
    got = [(r.step, r.lhs, r.rhs, r.pair_count) for r in rows]
    # step1: (a,b) mass 2*2 + 3 = 7; step2: (ab,ab) mass 2; then no pairs
    assert got == [(1, "a", "b", 7), (2, "ab", "ab", 2)]


def test_bpe_train_tie_breaks_lexically(spark):
    # (a,b) and (c,d) both mass 2 -> lexicographic (a,b) first
    v = _vocab(spark, [("ab", 2), ("cd", 2)])
    rows = bpe.bpe_train(v, n_merges=1).collect()
    assert [(r.lhs, r.rhs) for r in rows] == [("a", "b")]


def test_bpe_oracle_early_stop_matches_engine(spark):
    """The unrolled DuckDB oracle must ALSO stop emitting merge rows
    when the pair supply dries up (empty pc -> NULL key dropped, vocab
    passes through the LEFT JOIN) — pinned on a vocab that fuses after
    one merge."""
    import duckdb

    import __spark_entry__ as E
    from ddaugner_spark.operators.textstats import vocab_df
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "ab ab", "en", "s")], ["doc_id", "text", "lang", "source"]
    ).withColumn("n_chars", F.length("text").cast("long"))
    engine = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in bpe.bpe_train(vocab_df(docs), n_merges=5).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'ab ab', 'en', 's', 5)) t(doc_id, text, lang, source, n_chars)"
    )
    oracle = [tuple(r) for r in con.execute(E.oracle_sql()["q_bpe_train"]).fetchall()]
    assert engine == [(1, "a", "b", 2)]
    assert sorted(oracle) == sorted(engine)
