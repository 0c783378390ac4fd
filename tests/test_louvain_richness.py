"""Parallel Louvain local moves (operators/graph.py louvain_rounds),
Chao1/Good–Turing vocabulary richness (operators/textstats.py
vocab_richness).

The sf gate replays both against SQL twins on the corpus; pinned here:
a two-clique barbell whose communities Louvain must find (and LPA's
vote counting alone can get wrong), a brute-force Python replay of the
integer gain argmax, and hand-counted richness folds.
"""

import pytest

from ddaugner_spark.operators.graph import louvain_rounds, modularity
from ddaugner_spark.operators.textstats import vocab_richness


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def _brute_louvain(pairs, rounds=2):
    """Eager replay: synchronous integer-gain moves, min-id ties."""
    sym = {}
    und = set()
    for a, b in pairs:
        und.add((min(a, b), max(a, b)))
    for a, b in und:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    m = len(und)
    k = {n: len(v) for n, v in sym.items()}
    lab = {n: n for n in sym}
    for _ in range(rounds):
        tot = {}
        for n in sym:
            tot[lab[n]] = tot.get(lab[n], 0) + k[n]
        new = {}
        for n in sym:
            kic = {lab[n]: 0}
            for nb in sym[n]:
                kic[lab[nb]] = kic.get(lab[nb], 0) + 1
            best = None
            for c, kc in kic.items():
                own_corr = k[n] if c == lab[n] else 0
                gain = 2 * m * kc - k[n] * (tot[c] - own_corr)
                cand = (-gain, c)
                if best is None or cand < best:
                    best = cand
            new[n] = best[1]
        lab = new
    return lab


class TestLouvain:
    BARBELL = [
        # clique 1: a1 a2 a3 a4; clique 2: b1 b2 b3 b4; one bridge
        ("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
        ("a2", "a3"), ("a2", "a4"), ("a3", "a4"),
        ("b1", "b2"), ("b1", "b3"), ("b1", "b4"),
        ("b2", "b3"), ("b2", "b4"), ("b3", "b4"),
        ("a4", "b1"),
    ]

    def test_barbell_two_communities(self, spark, tmp_path):
        out = {
            r.entity: r.community
            for r in louvain_rounds(
                _edges(spark, self.BARBELL),
                rounds=2,
                stage_dir=str(tmp_path / "lv"),
            ).collect()
        }
        a = {out[f"a{i}"] for i in range(1, 5)}
        b = {out[f"b{i}"] for i in range(1, 5)}
        assert len(a) == 1 and len(b) == 1 and a != b

    def test_matches_integer_gain_replay(self, spark, tmp_path):
        # an asymmetric graph exercising ties, hubs and the own-
        # community degree correction
        pairs = self.BARBELL + [("b4", "c1"), ("c1", "c2"), ("c2", "a1")]
        got = {
            r.entity: r.community
            for r in louvain_rounds(
                _edges(spark, pairs), rounds=2,
                stage_dir=str(tmp_path / "lv2"),
            ).collect()
        }
        assert got == _brute_louvain(pairs, rounds=2)

    def test_beats_or_ties_singletons_on_modularity(self, spark, tmp_path):
        e = _edges(spark, self.BARBELL)
        labels = louvain_rounds(e, rounds=2, stage_dir=str(tmp_path / "lv3"))
        q = sum(
            r.contrib for r in modularity(e, labels).collect()
        )
        # barbell ground truth: 2 clique communities, Q ≈ 0.3787
        assert q == pytest.approx(2 * (6 / 13 - (13 / 26) ** 2), abs=1e-6)


class TestVocabRichness:
    def test_hand_counted(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a b c"), (2, "b d e"), (3, "")],
            ["doc_id", "text"],
        )
        r = vocab_richness(docs).collect()[0]
        # counts: a=2, b=2, c=1, d=1, e=1  (empty doc contributes [])
        assert (r.vocab, r.n_tokens) == (5, 7)
        assert (r.n_singletons, r.n_doubletons) == (3, 2)
        assert r.chao1 == pytest.approx(5 + 3 * 2 / (2 * 3), abs=1e-6)
        assert r.gt_unseen_mass == pytest.approx(3 / 7, abs=1e-6)

    def test_no_doubletons_chao1_finite(self, spark):
        docs = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        r = vocab_richness(docs).collect()[0]
        assert r.n_doubletons == 0
        # bias-corrected form: V + N1(N1-1)/2
        assert r.chao1 == pytest.approx(3 + 3 * 2 / 2, abs=1e-6)


class TestSalsa:
    def _e(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_degree_normalized_fixed_point(self, spark):
        # star-capture fixture: hub h points at a1..a3; h2 points only
        # at a1.  HITS would give a1..a3 equal authority from h; SALSA
        # splits h's mass 1/3 each so a1 (also endorsed by the focused
        # h2) must dominate.
        pairs = [("h", "a1"), ("h", "a2"), ("h", "a3"), ("h2", "a1")]
        from ddaugner_spark.operators.graph import salsa

        out = {r.node: r for r in salsa(self._e(spark, pairs), iters=2).collect()}
        assert out["a1"].authority > out["a2"].authority == out["a3"].authority
        # brute fixed-point replay, 2 iterations
        S = 10**12
        nodes = {"h", "h2", "a1", "a2", "a3"}
        e = pairs
        od = {"h": 3, "h2": 1}
        ind = {"a1": 2, "a2": 1, "a3": 1}
        h = {n: S for n in nodes}
        for _ in range(2):
            a = {n: 0 for n in nodes}
            for s, d in e:
                a[d] += h[s] // od[s]
            h = {n: 0 for n in nodes}
            for s, d in e:
                h[s] += a[d] // ind[d]
        th, ta = sum(h.values()), sum(a.values())
        for n in nodes:
            assert out[n].hub == round(h[n] / th, 6)
            assert out[n].authority == round(a[n] / ta, 6)

    def test_sinks_and_sources(self, spark):
        from ddaugner_spark.operators.graph import salsa

        out = {
            r.node: r
            for r in salsa(self._e(spark, [("s", "t")]), iters=2).collect()
        }
        assert out["t"].hub == 0.0 and out["s"].authority == 0.0
        assert out["s"].hub == 1.0 and out["t"].authority == 1.0


class TestBurtConstraint:
    def test_star_vs_clique(self, spark):
        """The star CENTER brokers (no ties among its contacts) ->
        minimal constraint; clique members are maximally embedded ->
        high constraint; igraph-textbook values pinned."""
        from ddaugner_spark.operators.graph import burt_constraint

        star = _edges(spark, [("c", f"l{i}") for i in range(4)])
        got = {r.entity: r for r in burt_constraint(star).collect()}
        # center: p = 1/4 per leaf, no indirect paths -> C = 4·(1/16)
        assert got["c"].constraint == pytest.approx(0.25, abs=1e-6)
        # leaf: single contact -> C = 1
        assert got["l0"].degree == 1
        assert got["l0"].constraint == pytest.approx(1.0, abs=1e-6)

        k4 = _edges(
            spark,
            [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d")],
        )
        k = {r.entity: r.constraint for r in burt_constraint(k4).collect()}
        # K4: per contact (1/3 + 2·(1/9))² = (5/9)²; C = 3·25/81
        want = 3 * (5 / 9) ** 2
        for v in k.values():
            assert v == pytest.approx(want, abs=1e-5)
        # the broker is less constrained than the clique member
        assert got["c"].constraint < min(k.values())


class TestNpmi:
    def _m(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, sent_id long, surface string"
        )

    def test_bounds_and_corners(self, spark):
        import math

        from ddaugner_spark.operators.graph import npmi_edges

        rows = [
            # s1: A B always together (2 sentences), C alone once
            (1, 1, "A"), (1, 1, "B"),
            (1, 2, "A"), (1, 2, "B"),
            (1, 3, "C"),
            # one mixed sentence: A with C
            (1, 4, "A"), (1, 4, "C"),
        ]
        out = {(r.a, r.b): r for r in npmi_edges(self._m(spark, rows)).collect()}
        ab = out[("A", "B")]
        # eager replay: N=4 sentences; c(A)=3, c(B)=2, c(AB)=2
        pmi = math.log(4 * 2 / (3 * 2))
        npmi = pmi / (-math.log(2 / 4))
        assert ab.pmi == pytest.approx(pmi, abs=1e-6)
        assert ab.npmi == pytest.approx(npmi, abs=1e-6)
        assert all(-1 - 1e-9 <= r.npmi <= 1 + 1e-9 for r in out.values())
        # perfect-co-occurrence corner: a pair in EVERY sentence
        solo = [(1, i, s) for i in range(3) for s in ("X", "Y")]
        corner = npmi_edges(self._m(spark, solo)).collect()[0]
        assert corner.npmi == 1.0

    def test_npmi_ranks_dedicated_pair_over_hub_pair(self, spark):
        """A always-together rare pair must out-rank a hub pair with
        the same raw count — the frequency correction npmi exists for."""
        from ddaugner_spark.operators.graph import npmi_edges

        rows = []
        # hub H appears in 6 sentences, with P in 2 of them
        for i in range(6):
            rows.append((1, i, "H"))
        rows += [(1, 0, "P"), (1, 1, "P")]
        # dedicated pair D1 D2: 2 sentences, always together
        rows += [(1, 10, "D1"), (1, 10, "D2"), (1, 11, "D1"), (1, 11, "D2")]
        out = {(r.a, r.b): r.npmi for r in npmi_edges(self._m(spark, rows)).collect()}
        assert out[("D1", "D2")] > out[("H", "P")]
