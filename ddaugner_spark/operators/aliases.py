"""Character alias expansion + false-positive PER demotion (J2 complete).

Reference semantics being lifted:

* alias expansion — /root/reference/fix_ner.py:55-68: for every
  character full name, every ordered sub-combination of its space-split
  components of size 0..len-1 is an alias, KEPT only if it is non-empty,
  does not start with a lowercase character, and is not (lowercased) a
  title; the final alias set is full names ∪ kept components;
* unknown-PER demotion — fix_ner.py:224-233: a PER entity whose surface
  is not in the (expanded) character set and is not a title is retagged
  ``O`` (the engine applies the fix deterministically where the
  reference asks interactively);
* lowercase-PER demotion — fix_ner.py:235-250: any window of
  all-lowercase tokens tagged ``B-PER I-PER…`` is retagged ``O``.

Scale design: alias expansion is a narrow per-name array expression
(2^k bitmask subsets over k ≤ ~6 name components); the expanded alias
table is tiny and BROADCAST to the demotion join.  Demotion itself is a
map-only tags rewrite (decode spans → rewrite positions), with the span
array let-bound so nothing is re-evaluated per position.

The title set mirrors the reference's ``nameparser.config.titles.TITLES
| {monsieur, mr, mr., mrs, mrs., m.}``; nameparser is not in this
container, so a documented subset covering every title that appears in
the reference's books ships here and the full set is used when
nameparser is importable (swap point, same pattern as the BERT stub).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fallback title set (lowercased). Swap point: the reference uses the
#: full nameparser TITLES; we import it when available.
_FALLBACK_TITLES = {
    "mr", "mr.", "mrs", "mrs.", "ms", "ms.", "miss", "master", "sir",
    "madam", "madame", "monsieur", "m.", "dr", "dr.", "doctor", "prof",
    "prof.", "professor", "lord", "lady", "duke", "duchess", "king",
    "queen", "prince", "princess", "count", "countess", "baron",
    "baroness", "captain", "capt", "capt.", "colonel", "col", "col.",
    "major", "general", "gen", "gen.", "lieutenant", "lt", "lt.",
    "sergeant", "sgt", "sgt.", "father", "mother", "brother", "sister",
    "uncle", "aunt", "reverend", "rev", "rev.", "saint", "st", "st.",
    "don", "dona", "señor", "señora", "herr", "frau", "fraulein",
}


def title_set() -> set[str]:
    try:  # pragma: no cover - container lacks nameparser
        from nameparser.config.titles import TITLES

        base = set(TITLES)
    except ImportError:
        base = set(_FALLBACK_TITLES)
    return base | {"monsieur", "mr", "mr.", "mrs", "mrs.", "m."}


def expand_character_aliases(characters: DataFrame, name_col: str = "name") -> DataFrame:
    """(group cols…, alias) — the fix_ner.py:55-68 expansion as narrow
    array expressions: bitmask-enumerate ordered component subsets, keep
    capitalized non-title ones, union the full name.

    ``characters`` carries one full character name per row plus any
    grouping columns (e.g. ``book``); all non-name columns pass through.
    """
    titles = sorted(title_set())
    comps = F.split(F.col(name_col), " ")
    k = F.size(comps)
    # masks 1 .. 2^k-1; the all-ones mask regenerates the full name,
    # which the union below adds anyway (distinct dedups).  pow-based
    # arithmetic: shiftleft/shiftright only take literal ints in pyspark.
    n_masks = F.pow(F.lit(2.0), k.cast("double")).cast("int") - 1
    # cap k: a pathological 50-component "name" would enumerate 2^50
    # subsets; real character names are ≤ ~6 components, so ≤ 12 is a
    # pure safety guard (the full name itself is still unioned below)
    masks = F.when((k >= 1) & (k <= 12), F.sequence(F.lit(1), n_masks)).otherwise(
        F.array().cast("array<int>")
    )
    idx = F.zip_with(
        comps,
        F.sequence(F.lit(0), k - 1),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )

    def subset(m: Column) -> Column:
        def bit_set(z):
            return (
                F.pmod(
                    (m.cast("double") / F.pow(F.lit(2.0), z["i"].cast("double")))
                    .cast("int"),
                    F.lit(2),
                )
                == 1
            )

        return F.array_join(
            F.transform(F.filter(idx, bit_set), lambda z: z["c"]), " "
        )

    pass_cols = [c for c in characters.columns if c != name_col]
    expanded = characters.select(
        *pass_cols, F.explode(F.transform(masks, subset)).alias("alias")
    )
    # keep = reference's `not alias[0].islower()`: uppercase OR uncased
    # (digits/punctuation are KEPT — lower(c)==c alone would drop them)
    first = F.substring("alias", 1, 1)
    expanded = expanded.filter(
        (F.col("alias") != "")
        & ((first != F.lower(first)) | (first == F.upper(first)))
        & ~F.lower(F.col("alias")).isin(titles)
    )
    full = characters.select(*pass_cols, F.col(name_col).alias("alias"))
    return expanded.unionByName(full).distinct()


def demote_unknown_per(
    tagged: DataFrame,
    aliases: DataFrame,
    group_col: str = "book",
    lowercase_rule: bool = True,
) -> DataFrame:
    """Rewrite ``tags`` so that (a) PER entities whose surface is neither
    a known alias nor a title and (b, when ``lowercase_rule``)
    all-lowercase PER runs become ``O`` (fix_ner.py:224-250, the
    deterministic fix path).  ``lowercase_rule=False`` applies only the
    unknown-character rule — useful for corpora whose whole vocabulary is
    lowercase (the synthetic tables), where rule (b) would demote
    everything; rule (b) itself is pinned on the reference's real books
    in tests/test_aliases.py.

    The lowercase rule is the reference's EXACT windowed pass
    (fix_ner.py:235-250) including its read timing: windows of length
    5..1, demote when every window token ``islower()`` (cased and
    lowercase — digits/punctuation do NOT qualify), the head tag is
    ``B-PER`` and the tail tags end with ``PER`` — where head/tail are
    read from the LEVEL-START state (the reference's lazy ``windowed``
    iterator reads each position before any same-level demotion lands),
    so a mixed-case span whose head tokens are lowercase is PARTIALLY
    demoted (orphan ``I-PER`` tags survive) and overlapping same-level
    windows can BOTH apply off the same snapshot.  See
    ``_lowercase_windowed_pass``.  Row-boundary note: the reference
    slides windows over the flat book token stream; the engine applies
    the pass per row (rows are sentences/documents) — windows never
    cross rows, which differs only for PER runs that straddle a row
    boundary.

    ``tagged``: (group_col, doc_id, tokens, tags); ``aliases``:
    (group_col, alias).  The per-group alias set is collected to an array
    column and BROADCAST — at KG scale the character/alias dictionary is
    dimension-sized while the tagged corpus is the fact side."""
    from .mentions import _decode_spans

    titles = sorted(title_set())
    alias_arr = aliases.groupBy(group_col).agg(
        F.collect_set("alias").alias("_aliases")
    )
    df = tagged.join(F.broadcast(alias_arr), group_col, "left").withColumn(
        "_aliases", F.coalesce(F.col("_aliases"), F.array().cast("array<string>"))
    )

    spans = _decode_spans(F.col("tags"), n=F.size("tags"))

    def demote_cond(s):
        unknown = ~F.array_contains(F.col("_aliases"), s["surface"]) & ~F.lower(
            s["surface"]
        ).isin(titles)
        return (s["tag"] == "PER") & unknown

    demoted = F.filter(spans, demote_cond)
    # let-bind the demoted span array; rewrite covered positions to O
    z = F.array(F.struct(demoted.alias("ds")))
    tags1 = F.element_at(
        F.transform(
            z,
            lambda zz: F.zip_with(
                F.col("tags"),
                F.sequence(F.lit(0), F.size("tags") - 1),
                lambda t, i: F.when(
                    F.exists(
                        zz["ds"],
                        lambda s: (i >= s["start_idx"]) & (i <= s["end_idx"]),
                    ),
                    F.lit("O"),
                ).otherwise(t),
            ),
        ),
        1,
    )
    new_tags = (
        _lowercase_windowed_pass(tags1) if lowercase_rule else tags1
    )
    out = df.withColumn(
        "tags",
        F.when(F.size("tags") > 0, new_tags).otherwise(F.col("tags")),
    )
    return out.drop("_aliases")


def _tok_at(p: Column) -> Column:
    return F.element_at(F.col("tokens"), (p + F.lit(1)).cast("int"))


def _is_lower_tok(p: Column) -> Column:
    """Python ``str.islower()``: has cased chars, all lowercase —
    i.e. equals its lowercase form AND differs from its uppercase form
    (digits/punctuation-only tokens are NOT lowercase)."""
    t = _tok_at(p)
    return (t == F.lower(t)) & (t != F.upper(t))


def _lowercase_windowed_pass(tags_in: Column, max_w: int = 5) -> Column:
    """fix_ner.py:235-250 with the reference's EXACT read timing: the
    loop slides ``more_itertools.windowed`` over the tag list while
    mutating it in place, and ``windowed`` reads each position ONCE per
    level — so every window of a level is evaluated against the tags AS
    THEY STOOD AT LEVEL START (a window's demotion lands only after its
    positions were read), and mutations become visible only at the next
    (smaller) level.  Equivalently: per level i = max_w..1, demote the
    UNION of windows whose snapshot head is ``B-PER``, whose snapshot
    tail tags end with ``PER`` and whose tokens all ``islower()``
    (equivalence to the lazy-iterator reference loop is fuzz-verified in
    tests/test_aliases.py).  Each level is one let-bound transform over
    the previous level's array — nothing re-evaluates per element."""
    n = F.size(F.col("tokens"))

    def _one_level(tg_expr: Column, i: int) -> Column:
        z = F.array(F.struct(tg_expr.alias("tg")))

        def level(zz):
            tg = zz["tg"]

            def cond(j):
                c = F.element_at(tg, (j + 1).cast("int")) == "B-PER"
                for k in range(i):
                    c = c & _is_lower_tok(j + F.lit(k))
                if i > 1:
                    c = c & F.forall(
                        F.slice(tg, (j + 2).cast("int"), i - 1),
                        lambda t: t.endswith("PER"),
                    )
                return c

            starts = F.filter(
                F.when(n >= i, F.sequence(F.lit(0), (n - i).cast("int"))).otherwise(
                    F.array().cast("array<int>")
                ),
                cond,
            )
            # let-bind the (computed) start list so the per-position
            # rewrite reads it without re-evaluation
            z2 = F.array(F.struct(starts.alias("ss"), tg.alias("tg2")))
            return F.element_at(
                F.transform(
                    z2,
                    lambda zz2: F.transform(
                        zz2["tg2"],
                        lambda t, p: F.when(
                            F.exists(
                                zz2["ss"], lambda j: (p >= j) & (p < j + i)
                            ),
                            F.lit("O"),
                        ).otherwise(t),
                    ),
                ),
                1,
            )

        return F.element_at(F.transform(z, level), 1)

    tg = tags_in
    for i in range(max_w, 0, -1):
        tg = _one_level(tg, i)
    return tg
