"""Property tests for the pure BIO kernels — same invariants as the
reference's test suite (tests/test_utils.py:29-64, tests/strategies.py:9-46),
re-expressed with our own hypothesis strategies."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ddaugner_spark.kernels import (
    Entity,
    entities_from_bio_tags,
    entities_to_bio_tags,
    majority_voting,
    replace_entity_occurrences,
    search_ner_pattern,
)

CLASSES = ["PER", "LOC", "ORG", "MISC"]


@st.composite
def bio_sequence(draw, max_len=30):
    """Valid BIO run: O's and B-X followed by 0..3 I-X (reference
    strategies.py:9-26 shape)."""
    tags = []
    n = draw(st.integers(0, max_len))
    while len(tags) < n:
        if draw(st.booleans()):
            tags.append("O")
        else:
            cls = draw(st.sampled_from(CLASSES))
            tags.append(f"B-{cls}")
            for _ in range(draw(st.integers(0, 3))):
                if len(tags) >= n:
                    break
                tags.append(f"I-{cls}")
    return tags[:n]


@st.composite
def sentence(draw):
    tags = draw(bio_sequence())
    toks = draw(
        st.lists(
            st.text(string.ascii_lowercase, min_size=1, max_size=6),
            min_size=len(tags),
            max_size=len(tags),
        )
    )
    return toks, tags


@given(sentence())
@settings(max_examples=200)
def test_roundtrip_entities_bio(s):
    """entities ↔ BIO bijection on valid sequences (test_utils.py:47-64)."""
    toks, tags = s
    ents = entities_from_bio_tags(toks, tags)
    assert entities_to_bio_tags(ents, len(tags)) == tags


@given(sentence())
@settings(max_examples=200)
def test_entity_structure(s):
    toks, tags = s
    for e in entities_from_bio_tags(toks, tags):
        assert 0 <= e.start_idx <= e.end_idx < len(toks)
        assert list(e.tokens) == toks[e.start_idx : e.end_idx + 1]
        assert tags[e.start_idx] in (f"B-{e.tag}", f"I-{e.tag}")


def test_inconsistent_i_start_resolved():
    """I- with no open entity opens one when resolve_inconsistencies
    (utils.py:147-153)."""
    ents = entities_from_bio_tags(["a", "b", "c"], ["O", "I-PER", "I-PER"])
    assert ents == [Entity(("b", "c"), "PER", 1, 2)]
    assert entities_from_bio_tags(
        ["a", "b"], ["I-PER", "O"], resolve_inconsistencies=False
    ) == []


def test_cross_class_i_extends_run():
    """Reference quirk preserved: I- of a *different* class extends an open
    run (utils.py:130 only checks the prefix)."""
    ents = entities_from_bio_tags(["a", "b"], ["B-PER", "I-LOC"])
    assert len(ents) == 1 and ents[0].tag == "PER" and ents[0].end_idx == 1


def test_search_ner_pattern_overlaps():
    toks = ["x", "x", "x"]
    tags = ["O", "O", "O"]
    assert search_ner_pattern([("x", "O"), ("x", "O")], toks, tags) == [(0, 1), (1, 2)]


def test_replace_entity_occurrences():
    toks = ["john", "likes", "john"]
    tags = ["B-PER", "O", "B-PER"]
    nt, ng = replace_entity_occurrences(toks, tags, ["john"], "PER", ["mary", "jane"])
    assert nt == ["mary", "jane", "likes", "mary", "jane"]
    assert ng == ["B-PER", "I-PER", "O", "B-PER", "I-PER"]


def test_majority_voting_exact():
    """Mirrors the reference's exact cases (tests/test_utils.py:66-80)."""
    toks = ["a", "b", "a", "a"]
    tags = ["B-PER", "O", "O", "O"]
    # 'a' appears once as PER, twice as O → majority O
    assert majority_voting(toks, tags) == ["O", "O", "O", "O"]
    toks = ["a", "a", "b", "a"]
    tags = ["B-PER", "B-PER", "O", "O"]
    assert majority_voting(toks, tags) == ["B-PER", "B-PER", "O", "B-PER"]
