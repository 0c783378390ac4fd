"""Compositional gazetteer name samplers (R4 complete).

Reference semantics being lifted:

* Elder-Scrolls-style names — 10 valid forms over (prefix, first, last,
  suffix) components with a fixed probability ladder
  (/root/reference/ddaugner/resources/the_elder_scrolls.py:28-85:
  25% first · 25% first+last · 25% last · 10% first+suffix ·
  10% first+last+suffix · 1% each of the remaining 4 prefix/suffix
  forms);
* French-style names — 5 uniform shapes over (honorific, firstname,
  surname) with gendered honorific/firstname pairing
  (/root/reference/ddaugner/resources/french_names.py:19-33).

The reference draws with unseeded ``random``; a distributed engine
cannot (SURVEY §4.3) — every draw here is a pure integer function of a
``seed`` (row identity), implemented twice with IDENTICAL arithmetic:

* as Catalyst column expressions (``*_name``) for corpus-scale
  injection — map-only, literals inlined, no Python;
* as plain Python (``*_name_py``) for the DuckDB-free unit tests and
  the Arrow path.

The probability ladder runs on ``pmod(seed·2654435761, 100)`` (integer
compare — no float hazard); each component index uses a distinct
multiplier so one seed yields independent-looking picks.

The component word lists are ORIGINAL to this engine (the reference's
JSON name lists are licensed game/census data; only the compositional
FORMS are lifted).  Swap in real lists by replacing the dicts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ELDER_SCROLLS_PARTS: dict[str, list[str]] = {
    "prefixs": ["Ser", "Arch-Mage"],
    "first_names": ["Aldor", "Brena", "Cyric", "Dralsi", "Endre"],
    "last_names": ["Stormhold", "Ravenwatch", "Frostvale"],
    "suffixs": ["the-Bold", "of-Kvatch"],
}

FRENCH_PARTS: dict[str, list[str]] = {
    "men_first_names": ["Armand", "Basile", "Corentin"],
    "women_first_names": ["Adele", "Blanche", "Colette"],
    "men_honorifics": ["Monsieur", "Maitre"],
    "women_honorifics": ["Madame", "Mademoiselle"],
    "surnames": ["Verlaine", "Daudet", "Moreau", "Lacombe"],
}

#: (threshold, (has_prefix, has_first, has_last, has_suffix)) — the
#: reference ladder the_elder_scrolls.py:28-63, thresholds ×100
ES_FORMS = [
    (25, (False, True, False, False)),
    (50, (False, True, True, False)),
    (75, (False, False, True, False)),
    (85, (False, True, False, True)),
    (95, (False, True, True, True)),
    (96, (False, False, True, True)),
    (97, (True, True, True, True)),
    (98, (True, True, True, False)),
    (99, (True, True, False, True)),
    (100, (True, True, False, False)),
]

_KNUTH = 2654435761
_MULT = {"prefixs": 7, "first_names": 11, "last_names": 13, "suffixs": 17}
_OFF = {"prefixs": 1, "first_names": 3, "last_names": 5, "suffixs": 7}
_ES_ORDER = ["prefixs", "first_names", "last_names", "suffixs"]


def _es_form_parts(form) -> list[str]:
    return [p for p, has in zip(_ES_ORDER, form) if has]


def elder_scrolls_name_py(seed: int, parts: dict | None = None) -> str:
    parts = parts or ELDER_SCROLLS_PARTS
    r = (seed * _KNUTH) % 100
    for thr, form in ES_FORMS:
        if r < thr:
            return " ".join(
                parts[p][(seed * _MULT[p] + _OFF[p]) % len(parts[p])]
                for p in _es_form_parts(form)
            )
    raise RuntimeError  # pragma: no cover


def elder_scrolls_name(seed: Column, parts: dict | None = None) -> Column:
    parts = parts or ELDER_SCROLLS_PARTS
    r = F.pmod(seed * _KNUTH, F.lit(100))

    def pick(p: str) -> Column:
        arr = F.array(*[F.lit(x) for x in parts[p]])
        return F.element_at(
            arr,
            (F.pmod(seed * _MULT[p] + _OFF[p], F.lit(len(parts[p]))) + 1).cast("int"),
        )

    expr = None
    for thr, form in ES_FORMS:
        name = F.concat_ws(" ", *[pick(p) for p in _es_form_parts(form)])
        expr = F.when(r < thr, name) if expr is None else expr.when(r < thr, name)
    return expr


def french_name_py(seed: int, parts: dict | None = None) -> str:
    p = parts or FRENCH_PARTS
    first = p["men_first_names"] + p["women_first_names"]
    hon = p["men_honorifics"] + p["women_honorifics"]
    shape = (seed * 31) % 5
    fi = (seed * 11 + 3) % len(first)
    hi = (seed * 7 + 1) % len(hon)
    si = (seed * 13 + 5) % len(p["surnames"])
    mi = (seed * 11 + 3) % len(p["men_first_names"])
    wi = (seed * 11 + 3) % len(p["women_first_names"])
    mh = (seed * 7 + 1) % len(p["men_honorifics"])
    wh = (seed * 7 + 1) % len(p["women_honorifics"])
    sur = p["surnames"][si]
    if shape == 0:
        return first[fi]
    if shape == 1:
        return f"{first[fi]} {sur}"
    if shape == 2:
        return f"{hon[hi]} {sur}"
    if shape == 3:
        return f"{p['men_honorifics'][mh]} {p['men_first_names'][mi]} {sur}"
    return f"{p['women_honorifics'][wh]} {p['women_first_names'][wi]} {sur}"


def french_name(seed: Column, parts: dict | None = None) -> Column:
    p = parts or FRENCH_PARTS
    first = p["men_first_names"] + p["women_first_names"]
    hon = p["men_honorifics"] + p["women_honorifics"]

    def pick(values: list[str], mult: int, off: int) -> Column:
        arr = F.array(*[F.lit(x) for x in values])
        return F.element_at(
            arr, (F.pmod(seed * mult + off, F.lit(len(values))) + 1).cast("int")
        )

    shape = F.pmod(seed * 31, F.lit(5))
    sur = pick(p["surnames"], 13, 5)
    return (
        F.when(shape == 0, pick(first, 11, 3))
        .when(shape == 1, F.concat_ws(" ", pick(first, 11, 3), sur))
        .when(shape == 2, F.concat_ws(" ", pick(hon, 7, 1), sur))
        .when(
            shape == 3,
            F.concat_ws(
                " ",
                pick(p["men_honorifics"], 7, 1),
                pick(p["men_first_names"], 11, 3),
                sur,
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                pick(p["women_honorifics"], 7, 1),
                pick(p["women_first_names"], 11, 3),
                sur,
            )
        )
    )
