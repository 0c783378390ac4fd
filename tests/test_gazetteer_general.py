"""General n=5..1 gazetteer matching — pins the exact reference
semantics (/root/reference/fix_ner.py:195-215) on hand-built sentences:

* longest-match: an n-gram beats the bigrams/unigrams inside it;
* the ``any(tag == 'O')`` guard: a window fully inside an applied span
  is skipped, a window partially overlapping one APPLIES and OVERWRITES;
* same-length left-to-right chains: left applies first, right overwrites
  its tail (both emit spans);
* head-overwrite merge quirk: overwriting the head of an applied run
  leaves orphan I-X tags that the decoder (utils.py:111-166) absorbs
  into the new span — the span's class comes from the opening B- tag.

Three implementations must agree: the Arrow tagger kernel
(DictTaggerModel.tag_tokens — a verbatim transcription of fix_ner's
loops), the column-native fold (operators/mentions.with_bio), and the
hand-computed expectation.
"""

import pyspark.sql.functions as F
import pytest

from ddaugner_spark import config
from ddaugner_spark.operators import mentions
from ddaugner_spark.operators.tagging import DictTaggerModel


def reference_tagger(toks):
    """Line-for-line port of the reference loops (fix_ner.py:195-215),
    kept separate from DictTaggerModel so the test is a differential."""
    tags = ["O"] * len(toks)
    dic = {s: c for s, c, _w in config.GAZETTEER}
    for n in range(5, 0, -1):
        for j in range(len(toks) - n + 1):
            cls = dic.get(" ".join(toks[j : j + n]))
            if cls is not None and any(t == "O" for t in tags[j : j + n]):
                tags[j : j + n] = [f"B-{cls}"] + [f"I-{cls}"] * (n - 1)
    return tags


CASES = [
    # (text, expected tags)
    # longest-match: trigram "hash join big" wins over bigram "hash join"
    # and unigram "hash"
    ("hash join big data", ["B-ORG", "I-ORG", "I-ORG", "O"]),
    # bigram alone still matches; 'hash' PER suppressed inside it
    ("a hash join row", ["O", "B-ORG", "I-ORG", "O"]),
    # left-extension: "fast hash join" covers the bigram start
    ("fast hash join row", ["B-ORG", "I-ORG", "I-ORG", "O"]),
    # same-length chain: "row column sort" applies, "column sort stream"
    # overwrites its tail (pos 3 was O) -> two spans
    (
        "row column sort stream big",
        ["B-ORG", "B-ORG", "I-ORG", "I-ORG", "O"],
    ),
    # window fully inside an applied span is skipped: "hash join" inside
    # the 5-gram "hash data row slow slow"? (disjoint check) — use the
    # 4-gram: "value slow hash data" then 'hash' unigram blocked
    ("value slow hash data", ["B-ORG", "I-ORG", "I-ORG", "I-ORG"]),
    # unigrams on clean text
    ("spark stream window", ["B-PER", "B-LOC", "B-LOC"]),
    # sentence terminator is never part of a mention
    ("the spark the", ["O", "B-PER", "O"]),
]


@pytest.mark.parametrize("text,want", CASES)
def test_windowed_semantics_kernel(text, want):
    toks = text.split(" ")
    assert reference_tagger(toks) == want
    assert DictTaggerModel().tag_tokens(toks) == want


def test_kernel_equals_reference_on_random_corpus(docs):
    """Differential: DictTaggerModel == the fix_ner port on real corpus
    rows (first 80 docs)."""
    model = DictTaggerModel()
    for r in docs.limit(80).collect():
        toks = r["text"].split(" ")
        assert model.tag_tokens(toks) == reference_tagger(toks)


def test_column_fold_equals_kernel(spark):
    """The Catalyst fold (with_bio) must equal the Python kernel on a
    corpus engineered to hit every overlap path, including a head
    overwrite (4-gram applied, then a later-level window overwriting its
    head is blocked by any-O; heads get overwritten only by same-or-later
    windows whose left part is O)."""
    rows = [(i, t) for i, (t, _w) in enumerate(CASES)]
    rows += [
        (100, "fast hash join big data"),       # two trigrams chained
        (101, "row column sort stream table hash"),  # trigram chain x2
        (102, "value slow hash data row slow slow"), # 4-gram then 5-gram tail
        (103, "customer hash join sort merge window"),
        (104, ""),                                # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["tags"]
        for r in mentions.with_bio(df).select("doc_id", "tags").collect()
    }
    model = DictTaggerModel()
    for doc_id, text in rows:
        toks = text.split(" ") if text else []
        assert got[doc_id] == model.tag_tokens(toks), (doc_id, text)


def test_mentions_decode_matches_kernel_spans(spark):
    """Decoded spans (mentions_df) == kernel entities on the engineered
    corpus, including the merged-span quirk."""
    from ddaugner_spark.kernels import entities_from_bio_tags

    rows = [
        (0, "fast hash join big data spark"),
        (1, "row column sort stream table hash"),
        (2, "value slow hash data row slow slow window"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["start_idx"], r["end_idx"], r["surface"], r["tag"])
        for r in mentions.mentions_df(df).collect()
    )
    model = DictTaggerModel()
    want = []
    for doc_id, text in rows:
        toks = text.split(" ")
        for e in entities_from_bio_tags(toks, model.tag_tokens(toks)):
            want.append((doc_id, e.start_idx, e.end_idx, e.surface, e.tag))
    assert got == sorted(want)


def test_config_invariants():
    surfaces = [s for s, _c, _w in config.GAZETTEER]
    assert len(surfaces) == len(set(surfaces)), "duplicate gazetteer surface"
    for s in surfaces:
        assert config.SENT_TERM not in s.split(" "), s
        for p in config.PRED_WORDS:
            assert p not in s.split(" "), (s, p)
    for s, c, _w in config.GAZETTEER:
        if c == "PER":
            assert " " not in s, "PER entries must stay unigram (augment oracle)"
    assert max(len(s.split(" ")) for s in surfaces) == 5
