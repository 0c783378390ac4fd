"""Character alias expansion + PER demotion (J2 complete), tested
differentially against a direct Python port of the reference loops
(/root/reference/fix_ner.py:55-68, 224-250) on the reference's OWN
``.characters`` and ``.conll`` book files.
"""

import glob
import itertools
import os

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.kernels import entities_from_bio_tags
from ddaugner_spark.operators import aliases as A

REF_NER = "/root/reference/ner"
BOOKS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(f"{REF_NER}/old/*.characters")
)[:5]

pytestmark = pytest.mark.skipif(not BOOKS, reason="reference books absent")


def _read_characters(book):
    path = f"{REF_NER}/old/{book}.characters"
    with open(path) as f:
        return set(f.read().split("\n"))


def _read_conll(book):
    toks, tags = [], []
    with open(f"{REF_NER}/old/{book}.conll") as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) >= 2:
                toks.append(parts[0])
                tags.append(parts[1].strip())
    return toks, tags


def _expand_py(book_characters, titles):
    """Direct port of fix_ner.py:55-68."""
    name_components = set()
    for character in book_characters:
        for i in range(len(character.split(" "))):
            for comb in itertools.combinations(character.split(" "), i):
                comp = " ".join(comb)
                if (
                    comp != ""
                    and not comp[0].islower()
                    and comp.lower() not in titles
                ):
                    name_components.add(comp)
    return book_characters | name_components


@pytest.mark.parametrize("book", BOOKS)
def test_alias_expansion_matches_reference_port(spark, book):
    chars = sorted(c for c in _read_characters(book) if c)
    titles = A.title_set()
    want = _expand_py(set(chars), titles)

    df = spark.createDataFrame([(book, c) for c in chars], "book string, name string")
    got = {
        r["alias"] for r in A.expand_character_aliases(df).collect()
    }
    # the reference's full-name union includes '' when the characters
    # file has a trailing empty line; we filtered those inputs, so
    # compare the non-empty sets
    assert got == {w for w in want if w}


def _windowed(seq, n):
    """Faithful stand-in for more_itertools.windowed (not in this
    container): lazy sliding deque over iter(seq) — reads each position
    exactly once, so in-place mutations of already-read positions are
    NOT visible to later windows of the same pass (the read timing the
    reference loop actually has)."""
    from collections import deque

    it = iter(seq)
    window = deque(maxlen=n)
    for _ in range(n):
        try:
            window.append(next(it))
        except StopIteration:
            return
    yield tuple(window)
    for x in it:
        window.append(x)
        yield tuple(window)


def _demote_py(toks, tags, characters, titles):
    """Direct port of fix_ner.py:224-250 (deterministic fix path):
    rule 1 over the precomputed entity list, then the literal windowed
    all-lowercase loop — sliding lazy windows over the tag list WHILE
    mutating it, exactly as the reference does (same-level windows see
    the level-start snapshot; mutations land at the next level)."""
    new = list(tags)
    for e in entities_from_bio_tags(toks, tags):
        if e.tag != "PER":
            continue
        mention = " ".join(e.tokens)
        if mention not in characters and mention.lower() not in titles:
            new[e.start_idx : e.end_idx + 1] = ["O"] * (e.end_idx - e.start_idx + 1)
    for i in range(5, 0, -1):
        for j, (tw, gw) in enumerate(zip(_windowed(toks, i), _windowed(new, i))):
            if (
                all(t.islower() for t in tw)
                and gw[0] == "B-PER"
                and all(g.endswith("PER") for g in gw[1:])
            ):
                new[j : j + i] = ["O"] * i
    return new


@pytest.mark.parametrize("book", BOOKS[:3])
def test_demotion_matches_reference_port(spark, book):
    toks, tags = _read_conll(book)
    # use a 3000-token slice so the spark row stays small
    toks, tags = toks[:3000], tags[:3000]
    titles = A.title_set()
    chars = _expand_py({c for c in _read_characters(book) if c}, titles)

    want = _demote_py(toks, tags, chars, titles)

    tagged = spark.createDataFrame(
        [(book, 0, toks, tags)],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    adf = spark.createDataFrame(
        [(book, a) for a in sorted(chars) if a],
        "book string, alias string",
    )
    got = A.demote_unknown_per(tagged, adf).select("tags").collect()[0]["tags"]
    assert got == want


def test_demotion_rules_unit(spark):
    """Hand-built sentence: unknown PER demoted, known PER kept, title
    kept, lowercase PER run demoted."""
    toks = ["Winston", "Smith", "likes", "mr", "unknownguy", "Nobody"]
    tags = ["B-PER", "I-PER", "O", "B-PER", "B-PER", "B-PER"]
    tagged = spark.createDataFrame(
        [("b", 0, toks, tags)],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    adf = spark.createDataFrame(
        [("b", "Winston Smith"), ("b", "Winston"), ("b", "Smith")],
        "book string, alias string",
    )
    got = A.demote_unknown_per(tagged, adf).collect()[0]["tags"]
    # "mr" is a title -> kept by rule 1 but demoted by the lowercase rule;
    # "unknownguy" lowercase + unknown -> O; "Nobody" capitalized but
    # unknown -> O
    assert got == ["B-PER", "I-PER", "O", "O", "O", "O"]


def test_windowed_lowercase_partial_demotion(spark):
    """Reference fidelity: a KNOWN mixed-case span whose head token is
    lowercase gets PARTIALLY demoted by the windowed pass (orphan I-PER
    survives, fix_ner.py:235-250); digit tokens are not islower()."""
    toks = ["de", "Villefort", "and", "agent", "007", "Bond"]
    tags = ["B-PER", "I-PER", "O", "B-PER", "I-PER", "I-PER"]
    chars = {"de Villefort", "agent 007 Bond"}
    titles = A.title_set()
    want = _demote_py(toks, tags, chars, titles)
    assert want == ["O", "I-PER", "O", "O", "I-PER", "I-PER"]  # partial x2

    tagged = spark.createDataFrame(
        [("b", 0, toks, tags)],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    adf = spark.createDataFrame(
        [("b", a) for a in sorted(chars)], "book string, alias string"
    )
    got = A.demote_unknown_per(tagged, adf).collect()[0]["tags"]
    assert got == want


def test_windowed_lowercase_merges_adjacent_spans(spark):
    """A 5-window headed at a lowercase B-PER swallows an adjacent
    all-lowercase span (tags[1:] only need to END with PER)."""
    toks = ["one", "two", "three", "four", "five"]
    tags = ["B-PER", "I-PER", "B-PER", "I-PER", "I-PER"]
    chars = {"one two", "three four five"}  # both known -> rule 1 keeps
    want = _demote_py(toks, tags, chars, A.title_set())
    assert want == ["O"] * 5  # one i=5 window demotes everything

    tagged = spark.createDataFrame(
        [("b", 0, toks, tags)],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    adf = spark.createDataFrame(
        [("b", a) for a in sorted(chars)], "book string, alias string"
    )
    got = A.demote_unknown_per(tagged, adf).collect()[0]["tags"]
    assert got == want


def test_alias_expansion_keeps_uncased_and_caps_components(spark):
    """Reference keep-rule is `not alias[0].islower()`: digit-initial
    components are KEPT (uncased ≠ lowercase); and a pathological
    many-component name must not enumerate 2^k subsets (k>12 guard) —
    its full name still passes through."""
    big = " ".join(f"W{i}" for i in range(20))
    ch = spark.createDataFrame(
        [("4th Lord Baratheon",), (big,)], "name string"
    )
    aliases = {r["alias"] for r in A.expand_character_aliases(ch).collect()}
    assert "4th" in aliases           # digit-initial kept (islower() is False)
    assert "4th Baratheon" in aliases
    assert big in aliases             # full name survives the k>12 guard
    assert len(aliases) < 2**13       # no 2^20 blowup


def test_windowed_snapshot_overlap_both_apply(spark):
    """Same-level overlapping windows are all evaluated against the
    LEVEL-START tags (the reference's lazy iterator reads each position
    before any same-level demotion lands), so two overlapping 5-windows
    BOTH apply — a live-state recheck would block the second and leave
    an orphan I-PER (caught by review, round 3)."""
    toks = ["anna", "bella", "core", "dora", "emma", "fay"]
    tags = ["B-PER", "B-PER", "I-PER", "I-PER", "I-PER", "I-PER"]
    chars = {"anna", "bella core dora emma fay"}  # rule 1 keeps both
    want = _demote_py(toks, tags, chars, A.title_set())
    assert want == ["O"] * 6  # windows j=0 AND j=1 both fire at i=5

    tagged = spark.createDataFrame(
        [("b", 0, toks, tags)],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    adf = spark.createDataFrame(
        [("b", a) for a in sorted(chars)], "book string, alias string"
    )
    got = A.demote_unknown_per(tagged, adf).collect()[0]["tags"]
    assert got == want


def test_windowed_pass_fuzz_vs_reference_port(spark):
    """Seeded fuzz: the Spark level-snapshot implementation equals the
    literal lazy-windowed reference loop on random token/tag streams
    (all names known, isolating the lowercase rule)."""
    import random

    rng = random.Random(99)
    rows, wants = [], []
    for r in range(40):
        n = rng.randint(1, 14)
        toks = [rng.choice(["aa", "Bb", "cc", "dd", "007"]) for _ in range(n)]
        tags = [rng.choice(["B-PER", "I-PER", "O", "B-LOC", "I-LOC"]) for _ in range(n)]
        # every surface known -> rule 1 never fires; rule 2 isolated
        chars = {" ".join(e.tokens) for e in entities_from_bio_tags(toks, tags)}
        wants.append(_demote_py(toks, tags, chars, A.title_set()))
        rows.append(("b", r, toks, tags, sorted(chars)))
    tagged = spark.createDataFrame(
        [(b, i, t, g) for b, i, t, g, _c in rows],
        "book string, doc_id long, tokens array<string>, tags array<string>",
    )
    aliases = spark.createDataFrame(
        [("b", a) for _b, _i, _t, _g, cs in rows for a in cs],
        "book string, alias string",
    )
    got = {
        r["doc_id"]: r["tags"]
        for r in A.demote_unknown_per(tagged, aliases).collect()
    }
    for i, want in enumerate(wants):
        assert got[i] == want, (i, rows[i], got[i], want)
