"""Hypothesis differential test: the distributed dictionary pipeline vs
an independent pure-Python derivation, over randomized corpora that mix
dictionary words, terminators and out-of-vocabulary noise."""

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st

from ddaugner_spark import config
from ddaugner_spark.kernels import entities_from_bio_tags
from ddaugner_spark.operators import mentions
from ddaugner_spark.operators.tagging import DictTaggerModel

VOCAB = (
    config.PER_WORDS
    + config.LOC_WORDS
    + [w for b in config.ORG_BIGRAMS for w in b.split(" ")]
    + config.PRED_WORDS
    + [config.SENT_TERM, "zz", "qq", "xx"]
)


def python_mentions(doc_id, text):
    toks = text.split(" ") if text else []
    model = DictTaggerModel()
    tags = model.tag_tokens(toks)
    sent_ids, c = [], 0
    for t in toks:
        sent_ids.append(c)
        if t == config.SENT_TERM:
            c += 1
    return {
        (doc_id, sent_ids[e.start_idx], e.start_idx, e.end_idx, e.surface, e.tag)
        for e in entities_from_bio_tags(toks, tags)
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=40).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_random_corpora_match_python(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in mentions.mentions_df(df).collect()}
    want = set()
    for i, t in rows:
        want |= python_mentions(i, t)
    assert got == want
