"""Katz centrality, SimRank, Soundex blocking (operators/graph.py
katz / simrank, operators/er.py soundex_expr / soundex_blocks).

The sf gate runs these over the synthetic host graph / token
vocabulary, which is structurally regular (every host scores alike),
so the discriminating behavior is pinned here: Katz on a hand-counted
asymmetric DAG, SimRank on the Jeh & Widom KDD'02 university example
against an independent pure-python replay of the fixed-point integer
algorithm, and Soundex on the textbook name set (h/w transparency,
vowel separation, first-letter collapse all exercised).
"""

import pytest

from ddaugner_spark.operators.er import soundex_blocks, soundex_expr
from ddaugner_spark.operators.graph import katz, simrank
from pyspark.sql import functions as F


# ------------------------------------------------------------- Katz

def test_katz_hand_counted_dag(spark):
    # a→b, b→c, a→c: walks into b = {a}, into c = {a→c, b→c, a→b→c}
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    got = {r.node: r.katz for r in katz(e, depth=3, beta_denom=4).collect()}
    # katz_int = 16·w1 + 4·w2 + 1·w3 over denominator 64
    assert got == {
        "a": 0.0,                 # no in-edges
        "b": 16 / 64,             # w1=1
        "c": (2 * 16 + 1 * 4) / 64,  # w1=2, w2=1 (a→b→c), w3=0
    }


def test_katz_depth_one_is_indegree(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("a", "c")], ["src", "dst"]
    )
    got = {r.node: r.katz for r in katz(e, depth=1, beta_denom=4).collect()}
    assert got == {"a": 0.0, "b": 2 / 4, "c": 1 / 4}


def test_katz_rejects_bad_depth(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        katz(e, depth=0)


# ---------------------------------------------------------- SimRank

_UNIV = [  # Jeh & Widom KDD'02 figure 1 (Univ/ProfA/ProfB/StudentA/StudentB)
    ("Univ", "ProfA"),
    ("Univ", "ProfB"),
    ("ProfA", "StudentA"),
    ("ProfB", "StudentB"),
    ("StudentA", "Univ"),
    ("StudentB", "Univ"),
]


def _simrank_py(edges, iters, scale=10**12, c_num=4, c_den=5):
    """Independent replay of the fixed-point integer algorithm."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    inn = {v: [] for v in nodes}
    for s, d in edges:
        inn[d].append(s)
    indeg = {v: len(inn[v]) for v in nodes}
    cur = {}  # off-diagonal only
    for _ in range(iters):
        full = dict(cur)
        full.update({(v, v): scale for v in nodes})
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b or not inn[a] or not inn[b]:
                    continue
                num = sum(full.get((i, j), 0) for i in inn[a] for j in inn[b])
                if num == 0:
                    continue
                s = (c_num * num) // (c_den * indeg[a] * indeg[b])
                if s > 0:
                    nxt[(a, b)] = s
        cur = nxt
    return {
        (a, b): round(s / scale, 9) for (a, b), s in cur.items() if a < b
    }


def test_simrank_univ_example_matches_replay(spark):
    e = spark.createDataFrame(_UNIV, ["src", "dst"])
    got = {
        (r.node_a, r.node_b): r.simrank for r in simrank(e, iters=2).collect()
    }
    assert got == _simrank_py(_UNIV, iters=2)
    # iteration 1 from the diagonal: s1(ProfA, ProfB) = C·|I∩|/(1·1) = 0.8
    # (shared in-neighbor Univ); after iteration 2 the students inherit
    # similarity THROUGH their professors: s2(StudentA, StudentB) =
    # C·s1(ProfA, ProfB) = 0.64 — the recursive structural semantics
    assert got[("ProfA", "ProfB")] == pytest.approx(0.8)
    assert got[("StudentA", "StudentB")] == pytest.approx(0.64)


def test_simrank_no_shared_structure_is_empty(spark):
    # two disjoint chains: no pair shares in-neighbor structure
    e = spark.createDataFrame([("a", "b"), ("c", "d")], ["src", "dst"])
    assert simrank(e, iters=2).count() == 0


# ---------------------------------------------------------- Soundex

_TEXTBOOK = {  # National Archives American Soundex reference codes
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",   # h-transparency: s,c collapse across the h
    "Ashcroft": "A261",
    "Tymczak": "T522",    # vowel separation: c,z both coded
    "Pfister": "P236",    # first-letter collapse: P,F same code
    "Honeyman": "H555",   # h first letter: nothing stripped
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Aubrey": "A160",     # vowel first letter: leading digit kept
}


def test_soundex_textbook_codes(spark):
    df = spark.createDataFrame([(n,) for n in _TEXTBOOK], ["name"])
    got = {
        r.name: r.code
        for r in df.select("name", soundex_expr(F.col("name")).alias("code")).collect()
    }
    assert got == _TEXTBOOK


def test_soundex_blocks_groups_phonetic_matches(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Ashcroft",), ("Lee",)],
        ["token"],
    )
    rows = {r.code: (r.n_forms, r.forms) for r in soundex_blocks(df).collect()}
    assert rows["R163"] == (2, "Robert|Rupert")
    assert rows["A261"] == (2, "Ashcraft|Ashcroft")
    assert rows["L000"] == (1, "Lee")
