"""WordPiece (F12): the Catalyst fold must equal the pure kernel on
every corpus word plus adversarial cases; greedy longest-match-first
semantics pinned by hand."""

import pyspark.sql.functions as F
import pytest

from ddaugner_spark import config
from ddaugner_spark.functions import wordpiece_pieces
from ddaugner_spark.kernels import wordpiece_tokenize


def test_greedy_longest_match_hand_cases():
    assert wordpiece_tokenize("window") == ["wind", "##ow"]
    assert wordpiece_tokenize("hash") == ["hash"]
    assert wordpiece_tokenize("customer") == ["cust", "##omer"]
    # greedy prefers 'stre' (4) over 'str' (3)
    assert wordpiece_tokenize("stream")[0] == "stre"
    # unknown characters collapse the whole word
    assert wordpiece_tokenize("Łódź") == ["[UNK]"]
    assert wordpiece_tokenize("a") == ["a"]


def test_unk_is_whole_word():
    # '9' is not in the vocab: even though 'val' matches, the word fails
    assert wordpiece_tokenize("val9") == ["[UNK]"]


@pytest.mark.parametrize("extra", [["flink", "presto", "Spark", "X1"], []])
def test_column_fold_equals_kernel(spark, docs, extra):
    words = sorted(
        {w for r in docs.limit(100).collect() for w in r["text"].split(" ")}
        | set(extra)
    )
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["p"])
        for r in df.select("word", wordpiece_pieces(F.col("word")).alias("p")).collect()
    }
    for w in words:
        assert got[w] == wordpiece_tokenize(w), w


def test_roundtrip_property():
    """Concatenating pieces (## stripped) reconstructs the word unless
    [UNK]."""
    for w in ["window", "stream", "spark", "aggregate", "zzzz", "queryable"]:
        p = wordpiece_tokenize(w)
        if p != ["[UNK]"]:
            assert "".join(x.removeprefix("##") for x in p) == w


def test_fertility_is_frequency_weighted(spark):
    """Fertility must weight by occurrence count, not vocabulary: a
    language whose COMMON word splits into many pieces reads worse than
    one where only a rare word does."""
    from ddaugner_spark.functions import wordpiece_pieces
    import pyspark.sql.functions as F

    vocab = spark.createDataFrame([("the",), ("quicksilver",)], "word string")
    np_ = {
        r["word"]: r["n"]
        for r in vocab.select(
            "word", F.size(wordpiece_pieces(F.col("word"))).alias("n")
        ).collect()
    }
    assert np_["the"] >= 1 and np_["quicksilver"] > np_["the"]
