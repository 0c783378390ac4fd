"""Arrow-batched tagging path (M1): differential identity with the
codegen path, and merge precedence rules."""

import pyspark.sql.functions as F

from ddaugner_spark.operators import mentions, tagging


def test_udf_path_identical_to_codegen_path(spark, docs):
    a = {tuple(r) for r in tagging.mentions_udf(docs).collect()}
    b = {tuple(r) for r in mentions.mentions_df(docs).collect()}
    assert a and a == b


def test_tagged_docs_default_o(spark):
    df = spark.createDataFrame([(1, "foo bar baz")], "doc_id long, text string")
    row = tagging.tagged_docs_udf(df).first()
    assert row["tags"] == ["O", "O", "O"]  # default tag (predict.py:88)


def test_merge_dictionary_wins(spark):
    model = spark.createDataFrame(
        [(1, ["a", "b"], ["B-PER", "O"])], "doc_id long, tokens array<string>, tags array<string>"
    )
    dic = spark.createDataFrame(
        [(1, ["a", "b"], ["B-ORG", "O"])], "doc_id long, tokens array<string>, tags array<string>"
    )
    merged = tagging.merge_tag_sources(model, dic).first()
    # dictionary non-O beats the model; model fills dictionary O's
    assert merged["tags"] == ["B-ORG", "O"]

    dic2 = spark.createDataFrame(
        [(1, ["a", "b"], ["O", "O"])], "doc_id long, tokens array<string>, tags array<string>"
    )
    merged2 = tagging.merge_tag_sources(model, dic2).first()
    assert merged2["tags"] == ["B-PER", "O"]
