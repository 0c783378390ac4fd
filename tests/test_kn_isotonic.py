"""Kneser-Ney bigram LM + isotonic (PAV) calibration — engine output
pinned against exact pure-Python references on the gate corpus."""

from collections import Counter

from ddaugner_spark.operators import textstats, traindata


def _py_kn(pairs, discount=0.75):
    """Interpolated KN over a bigram list — the per-pair eager form of
    textstats.kneser_ney_scores' distributed-count formulation."""
    c2 = Counter(pairs)
    cl, n1f, n1r = Counter(), Counter(), Counter()
    for (a, b), c in c2.items():
        cl[a] += c
        n1f[a] += 1
        n1r[b] += 1
    nbg = float(len(c2))
    probes = set(c2) | {(a, a) for (a, _b) in c2}
    out = {}
    for a, b in sorted(probes):
        c12 = c2.get((a, b), 0)
        s = max(c12 - discount, 0.0) / cl[a] + discount * n1f[a] / cl[a] * (
            n1r.get(b, 0) / nbg
        )
        out[(a, b)] = (2 if c12 > 0 else 1, round(s, 6))
    return out


def test_kneser_ney_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["w1"], r["w2"]): (r["level"], r["score"])
        for r in textstats.kneser_ney_scores(docs).collect()
    }
    bg = [
        (r["w1"], r["w2"])
        for r in textstats.word_bigrams(docs).select("w1", "w2").collect()
    ]
    want = _py_kn(bg)
    assert got and got == want


def test_kneser_ney_unseen_path_and_normalization(spark):
    """On a corpus where the corrupted twin (a, a) is unseen: the
    level-1 score is pure continuation mass, and interpolated KN's
    defining property holds — Σ_{w2 ∈ right vocab} P(w2|w1) == 1 for
    every context (checked from the same counts the engine uses)."""
    docs = spark.createDataFrame(
        [(1, "a b c a b d"), (2, "b c a c")], ["doc_id", "text"]
    )
    got = {
        (r["w1"], r["w2"]): (r["level"], r["score"])
        for r in textstats.kneser_ney_scores(docs).collect()
    }
    bg = [
        (r["w1"], r["w2"])
        for r in textstats.word_bigrams(docs).select("w1", "w2").collect()
    ]
    assert got == _py_kn(bg)
    assert got[("a", "a")][0] == 1 and got[("a", "a")][1] > 0
    # exact normalization over the full right vocabulary
    c2 = Counter(bg)
    cl, n1f, n1r = Counter(), Counter(), Counter()
    for (a, b), c in c2.items():
        cl[a] += c
        n1f[a] += 1
        n1r[b] += 1
    nbg = float(len(c2))
    vocab = set(n1r)
    for w1 in cl:
        tot = sum(
            max(c2.get((w1, w2), 0) - 0.75, 0.0) / cl[w1]
            + 0.75 * n1f[w1] / cl[w1] * (n1r[w2] / nbg)
            for w2 in vocab
        )
        assert abs(tot - 1.0) < 1e-12


def _py_pav(bins):
    """Stack PAV over (n, n_pos) rows in bin order; rate comparisons by
    exact cross-multiplication, ONE division per pooled block — the
    same arithmetic contract as the engine's minimax formulation (the
    two are the same fit by the classic PAV/minimax theorem)."""
    blocks = []  # [weight, pos_sum, n_bins]
    for n, p in bins:
        blocks.append([n, p, 1])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            w, s, k = blocks.pop()
            blocks[-1][0] += w
            blocks[-1][1] += s
            blocks[-1][2] += k
    out = []
    for w, s, k in blocks:
        out.extend([round(s / w, 6)] * k)
    return out


def test_isotonic_matches_python_pav_and_is_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        traindata.isotonic_calibration(docs, n_bins=10).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone non-decreasing by construction
    want = _py_pav([(r["n"], r["n_pos"]) for r in rows])
    assert iso == want
