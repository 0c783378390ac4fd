"""Pure BIO-tag kernels.

These are plain-Python/NumPy-free functions with exactly the semantics of
the reference's sentence-level primitives, so they can be (a) unit- and
property-tested without a SparkSession and (b) applied batch-wise inside
Arrow-vectorized pandas UDFs when an operator genuinely cannot be
expressed with built-in column functions.

Semantic contracts verified against the reference (see SURVEY.md §2):

* ``entities_from_bio_tags``  — /root/reference/ddaugner/utils.py:111-166
  (including the ``resolve_inconsistencies`` handling of entities that
  start with ``I-`` instead of ``B-``).
* ``entities_to_bio_tags``    — /root/reference/ddaugner/utils.py:169-180.
* ``search_ner_pattern``      — /root/reference/ddaugner/utils.py:59-78.
* ``replace_entity_occurrences`` — /root/reference/ddaugner/aug.py:40-74
  (``replace_sent_entity``: replace *all* pattern occurrences, rebuilding
  token/tag arrays right-to-left so indices stay valid).
* ``majority_voting``         — /root/reference/ddaugner/utils.py:81-108.

The corpus-scale formulations of the same semantics live in
``ddaugner_spark.operators`` as DataFrame expressions (run-id window trick
for BIO runs, n-gram broadcast joins for pattern search); these kernels are
the per-sentence oracle they are tested against.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Entity:
    """An entity span over a token sequence; ``end_idx`` is inclusive
    (reference convention, utils.py:19-22)."""

    tokens: Tuple[str, ...]
    tag: str
    start_idx: int
    end_idx: int

    @property
    def surface(self) -> str:
        return " ".join(self.tokens)


def entities_from_bio_tags(
    tokens: Sequence[str],
    bio_tags: Sequence[str],
    resolve_inconsistencies: bool = True,
) -> List[Entity]:
    """Decode BIO tag runs into entity spans.

    Mirrors utils.py:111-166: an open entity is closed by any tag that is
    not ``I-*`` (even an ``I-OTHER`` of a *different* class extends the
    open run — that quirk is preserved deliberately: the reference only
    checks the ``I-`` prefix when extending, utils.py:130).
    A leading ``I-X`` with no open entity opens one iff
    ``resolve_inconsistencies`` (utils.py:147-153), else it is dropped.
    """
    if len(tokens) != len(bio_tags):
        raise ValueError("len(tokens) != len(bio_tags)")

    entities: List[Entity] = []
    cur_tag: Optional[str] = None
    cur_start = 0

    for i, tag in enumerate(bio_tags):
        if cur_tag is not None and not tag.startswith("I-"):
            entities.append(
                Entity(tuple(tokens[cur_start:i]), cur_tag, cur_start, i - 1)
            )
            cur_tag = None

        if tag.startswith("B-"):
            cur_tag = tag[2:]
            cur_start = i
        elif tag.startswith("I-") and cur_tag is None and resolve_inconsistencies:
            cur_tag = tag[2:]
            cur_start = i

    if cur_tag is not None:
        entities.append(
            Entity(tuple(tokens[cur_start:]), cur_tag, cur_start, len(tokens) - 1)
        )
    return entities


def entities_to_bio_tags(entities: Sequence[Entity], tags_nb: int) -> List[str]:
    """Render entity spans back to a BIO tag list (utils.py:169-180).

    Later entities overwrite earlier ones on overlap, as in the reference
    (plain list assignment order)."""
    tags = ["O"] * tags_nb
    for e in entities:
        tags[e.start_idx] = f"B-{e.tag}"
        for i in range(e.start_idx + 1, e.end_idx + 1):
            tags[i] = f"I-{e.tag}"
    return tags


def search_ner_pattern(
    pattern: Sequence[Tuple[str, str]],
    tokens: Sequence[str],
    tags: Sequence[str],
) -> List[Tuple[int, int]]:
    """All (start, end-inclusive) windows where both the token and the tag
    sequences equal ``pattern`` (utils.py:59-78). Overlapping matches are
    all reported, as in the reference."""
    if len(tokens) != len(tags):
        raise ValueError("len(tokens) != len(tags)")
    n = len(pattern)
    if n == 0 or n > len(tokens):
        return []
    p_toks = tuple(p[0] for p in pattern)
    p_tags = tuple(p[1] for p in pattern)
    out = []
    for i in range(len(tokens) - n + 1):
        if tuple(tokens[i : i + n]) == p_toks and tuple(tags[i : i + n]) == p_tags:
            out.append((i, i + n - 1))
    return out


def replace_entity_occurrences(
    tokens: Sequence[str],
    tags: Sequence[str],
    entity_tokens: Sequence[str],
    entity_tag: str,
    new_tokens: Sequence[str],
) -> Tuple[List[str], List[str]]:
    """Replace *every* occurrence of the entity pattern
    ``B-{tag} I-{tag}*`` over ``entity_tokens`` with ``new_tokens``
    (re-tagged ``B-{tag} I-{tag}*``), rebuilding the arrays.

    Mirrors ``replace_sent_entity`` aug.py:40-74; occurrences are located
    with :func:`search_ner_pattern` and replaced right-to-left so earlier
    indices remain valid (the reference rebuilds functionally — same
    result)."""
    pattern = [(entity_tokens[0], f"B-{entity_tag}")] + [
        (t, f"I-{entity_tag}") for t in entity_tokens[1:]
    ]
    matches = search_ner_pattern(pattern, tokens, tags)
    new_toks = list(tokens)
    new_tags_out = list(tags)
    repl_tags = [f"B-{entity_tag}"] + [f"I-{entity_tag}"] * (len(new_tokens) - 1)
    for start, end in reversed(matches):
        new_toks[start : end + 1] = list(new_tokens)
        new_tags_out[start : end + 1] = repl_tags
    return new_toks, new_tags_out


def majority_voting(tokens: Sequence[str], tags: Sequence[str]) -> List[str]:
    """Per-surface PER-vs-O majority retagging (utils.py:81-108).

    For each entity surface found in the sentence, count its occurrences
    tagged as a full PER run vs tagged all-``O``; retag every occurrence to
    the majority side (ties → ``O``, matching ``>`` at utils.py:101)."""
    new_tags = list(tags)
    entities = entities_from_bio_tags(tokens, tags)
    for e in entities:
        etoks = list(e.tokens)
        per_pattern = [(etoks[0], "B-PER")] + [(t, "I-PER") for t in etoks[1:]]
        per_matches = search_ner_pattern(per_pattern, tokens, tags)
        o_matches = search_ner_pattern([(t, "O") for t in etoks], tokens, tags)
        for start, end in per_matches + o_matches:
            if len(per_matches) > len(o_matches):
                new_tags[start : end + 1] = ["B-PER"] + ["I-PER"] * (len(etoks) - 1)
            else:
                new_tags[start : end + 1] = ["O"] * len(etoks)
    return new_tags
