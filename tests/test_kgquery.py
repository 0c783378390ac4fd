"""KG-consumption operators: star BGP, schema screening, AMIE-lite
rule mining (operators/kgquery.py) and Cohen's kappa
(operators/scoring.py cohens_kappa)."""

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators import kgquery
from ddaugner_spark.operators.scoring import cohens_kappa


def _tri(spark, rows):
    """rows: (subj, pred, obj[, subj_tag, obj_tag]) triples (instances,
    duplicates = attestations)."""
    full = [
        (r + ("PER", "LOC"))[:5] if len(r) == 3 else r for r in rows
    ]
    return spark.createDataFrame(
        full, ["subj", "pred", "obj", "subj_tag", "obj_tag"]
    )


def test_star_pattern_binds_and_caps(spark):
    # x=a: p1 edges to y1 (support 2) and y2 (1); p2 edge to z1.
    rows = (
        [("a", "p1", "y1")] * 2
        + [("a", "p1", "y2")]
        + [("a", "p2", "z1")]
        + [("b", "p1", "y1")]  # no p2 edge at b -> no binding
    )
    out = kgquery.star_pattern(_tri(spark, rows), "p1", "p2", fanout_cap=8)
    got = {(r.x, r.y, r.z, r.support_y, r.support_z) for r in out.collect()}
    assert got == {("a", "y1", "z1", 2, 1), ("a", "y2", "z1", 1, 1)}


def test_star_pattern_cap_and_self_binding(spark):
    # 3 p1-objects at x, cap 2 keeps the 2 best-supported (tie -> obj asc);
    # y == z bindings are excluded.
    rows = (
        [("x", "p1", "o1")] * 3
        + [("x", "p1", "o2")] * 2
        + [("x", "p1", "o3")] * 2
        + [("x", "p2", "o1")]
        + [("x", "p2", "q")]
    )
    out = kgquery.star_pattern(_tri(spark, rows), "p1", "p2", fanout_cap=2)
    got = {(r.y, r.z) for r in out.collect()}
    # capped p1 objects: o1 (3), o2 (2; beats o3 on obj asc). o1-o1 excluded.
    assert got == {("o1", "q"), ("o2", "o1"), ("o2", "q")}


def test_domain_range_majority_and_flags(spark):
    rows = [
        ("a", "p", "b", "PER", "LOC"),
        ("c", "p", "d", "PER", "LOC"),
        ("e", "p", "f", "LOC", "LOC"),  # subj off-majority
        ("g", "p", "h", "PER", "PER"),  # obj off-majority
    ]
    out = kgquery.domain_range_violations(_tri(spark, rows))
    by_sig = {(r.subj_tag, r.obj_tag): r for r in out.collect()}
    assert all(
        (r.maj_subj_tag, r.maj_obj_tag) == ("PER", "LOC")
        for r in by_sig.values()
    )
    assert not by_sig[("PER", "LOC")].is_violation
    v = by_sig[("LOC", "LOC")]
    assert (v.subj_ok, v.obj_ok, v.is_violation) == (False, True, True)
    v = by_sig[("PER", "PER")]
    assert (v.subj_ok, v.obj_ok, v.is_violation) == (True, False, True)


def test_domain_range_tie_breaks_lexically(spark):
    # two signatures with equal mass: packed key picks the lexically
    # smaller (subj_tag, obj_tag) deterministically
    rows = [
        ("a", "p", "b", "PER", "LOC"),
        ("c", "p", "d", "LOC", "PER"),
    ]
    out = kgquery.domain_range_violations(_tri(spark, rows)).collect()
    assert {(r.maj_subj_tag, r.maj_obj_tag) for r in out} == {("LOC", "PER")}


def test_rule_mining_conf_and_pca(spark):
    # body p(x,y) & q(y,z): pairs (a,c) via b, (a2,c2) via b2.
    # head r holds for (a,c) only.  a2 has NO r-edge at all ->
    # PCA denominator = 1, std denominator = 2.
    rows = [
        ("a", "p", "b"),
        ("b", "q", "c"),
        ("a2", "p", "b2"),
        ("b2", "q", "c2"),
        ("a", "r", "c"),
        # second body+head instantiation so support >= 2 survives:
        ("a", "p", "b3"),
        ("b3", "q", "c3"),
        ("a", "r", "c3"),
    ]
    out = kgquery.mine_chain_rules(_tri(spark, rows), min_support=2)
    rules = {
        (r.body_pred1, r.body_pred2, r.head_pred): r for r in out.collect()
    }
    r = rules[("p", "q", "r")]
    # body pairs for (p,q): (a,c), (a,c3), (a2,c2) -> n_body 3
    # support: (a,c), (a,c3) -> 2; PCA: a has r-edges, a2 none -> n_pca 2
    assert (r.support, r.n_body, r.n_pca) == (2, 3, 2)
    assert r.conf == pytest.approx(2 / 3, abs=1e-6)
    assert r.pca_conf == pytest.approx(1.0, abs=1e-6)


def test_rule_mining_min_support_filters(spark):
    rows = [("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c")]
    out = kgquery.mine_chain_rules(_tri(spark, rows), min_support=2)
    assert out.count() == 0


def _tags(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "tags"])


def test_kappa_hand_value(spark):
    # classic 2-class example: po = 0.6, marginals A: 0.5/0.5, B: 0.7/0.3
    # pe = 0.5*0.7 + 0.5*0.3 = 0.5 -> kappa = 0.2
    a = _tags(spark, [(1, ["X"] * 5 + ["O"] * 5)])
    b = _tags(spark, [(1, ["X", "X", "X", "X", "O", "X", "X", "X", "O", "O"])])
    row = cohens_kappa(a, b).collect()[0]
    assert row.n_tokens == 10
    assert row.po == pytest.approx(0.6)
    assert row.pe == pytest.approx(0.5)
    assert row.kappa == pytest.approx(0.2)


def test_kappa_perfect_agreement_guard(spark):
    # both runs constant on one class: pe = 1, guarded to kappa = 1
    a = _tags(spark, [(1, ["O", "O", "O"])])
    row = cohens_kappa(a, a).collect()[0]
    assert (row.po, row.pe, row.kappa) == (1.0, 1.0, 1.0)


def test_kappa_multi_doc_alignment(spark):
    # disagreements only where (doc_id, pos) align
    a = _tags(spark, [(1, ["X", "O"]), (2, ["O", "O"])])
    b = _tags(spark, [(1, ["X", "X"]), (2, ["O", "O"])])
    row = cohens_kappa(a, b).collect()[0]
    assert row.n_tokens == 4
    assert row.po == pytest.approx(0.75)


def test_kappa_disjoint_classes_pe_zero(spark):
    # no shared tag class: pe = 0, kappa = po = 0 (not NULL)
    a = _tags(spark, [(1, ["X", "X"])])
    b = _tags(spark, [(1, ["Y", "Y"])])
    row = cohens_kappa(a, b).collect()[0]
    assert (row.po, row.pe, row.kappa) == (0.0, 0.0, 0.0)


def test_functional_conflicts_reports_only_functional_preds(spark):
    from ddaugner_spark.operators.kgquery import functional_conflicts

    tri = spark.createDataFrame(
        # born_in: 2 subjects, 3 (subj,obj) pairs -> fun 0.667; s2 conflicts
        # member: 2 subjects, 5 pairs -> fun 0.4, filtered at 0.5 despite conflicts
        [("s1", "born_in", "a"), ("s2", "born_in", "b"), ("s2", "born_in", "c"),
         ("s2", "born_in", "c"),  # duplicate attestation must not count twice
         ("t1", "member", "x"), ("t1", "member", "y"), ("t1", "member", "z"),
         ("t2", "member", "w"), ("t2", "member", "v")],
        "subj string, pred string, obj string",
    )
    rows = functional_conflicts(tri, min_functionality=0.5, sample_k=3).collect()
    assert [(r.pred, r.subj, r.n_objs, r.objs, r.functionality) for r in rows] == [
        ("born_in", "s2", 2, "b|c", 0.666667)
    ]


def test_functional_conflicts_sample_is_bounded_and_sorted(spark):
    from ddaugner_spark.operators.kgquery import functional_conflicts

    tri = spark.createDataFrame(
        [("s", "p", o) for o in ["d", "b", "e", "a", "c"]]
        + [(f"u{i}", "p", "x") for i in range(20)],
        "subj string, pred string, obj string",
    )
    rows = functional_conflicts(tri, min_functionality=0.5, sample_k=3).collect()
    assert [(r.subj, r.n_objs, r.objs) for r in rows] == [("s", 5, "a|b|c")]


def test_predicate_cardinality_classes(spark):
    """Hand-built predicates hitting all four classes; duplicates are
    attestations (deduped before counting); fan-out ratios exact."""
    from ddaugner_spark.operators.triples import predicate_cardinality

    rows = (
        # one_one: 3 heads -> 3 distinct tails bijectively
        [("a", "one_one", "x"), ("b", "one_one", "y"), ("c", "one_one", "z")]
        # one_n: 1 head -> 3 tails (tph 3, hpt 1)
        + [("h", "one_n", t) for t in ("t1", "t2", "t3")]
        # n_one: 3 heads -> 1 tail (tph 1, hpt 3)
        + [(s, "n_one", "hub") for s in ("s1", "s2", "s3")]
        # n_m: 2 heads x 2 tails full bipartite (tph 2, hpt 2)
        + [(s, "n_m", t) for s in ("u", "v") for t in ("p", "q")]
        # duplicate attestation must not change counts
        + [("a", "one_one", "x")]
    )
    out = {
        r["pred"]: r for r in predicate_cardinality(_tri(spark, rows)).collect()
    }
    assert out["one_one"]["cardinality"] == "1:1"
    assert out["one_n"]["cardinality"] == "1:N"
    assert out["n_one"]["cardinality"] == "N:1"
    assert out["n_m"]["cardinality"] == "N:M"
    assert out["one_one"]["n_pairs"] == 3  # dup deduped
    assert out["one_n"]["tails_per_head"] == 3.0
    assert out["n_one"]["heads_per_tail"] == 3.0
    assert out["n_m"]["tails_per_head"] == 2.0


def test_entity_fact_summary_rarest_first_and_cap(spark):
    """Facts rank rarest-predicate-first with (pred, obj) tiebreak;
    output per entity capped at k."""
    rows = (
        [("e", "common", t) for t in ("c1", "c2", "c3", "c4")]
        + [("e", "rare", "r1")]
        + [("f", "common", "c1")]
    )
    out = kgquery.entity_fact_summary(_tri(spark, rows), k=2).collect()
    by_e = sorted(
        [(r["rank"], r["pred"], r["obj"]) for r in out if r["subj"] == "e"]
    )
    # rare (freq 1) outranks common (freq 5); common ties break by obj
    assert by_e == [(1, "rare", "r1"), (2, "common", "c1")]
    assert all(r["rank"] <= 2 for r in out)
    assert [r for r in out if r["subj"] == "f"][0]["rank"] == 1


class TestPraFeatures:
    def _tri(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_walk_probabilities_hand_computed(self, spark):
        from ddaugner_spark.operators.kgquery import pra_path_features

        # a -p-> {b, c} (support 2 each); b -q-> d; c -q-> d, c -q-> e
        rows = []
        for _ in range(2):
            rows += [
                ("a", "p", "b"), ("a", "p", "c"),
                ("b", "q", "d"), ("c", "q", "d"), ("c", "q", "e"),
            ]
        out = {
            (r.subj, r.path, r.obj): r.prob
            for r in pra_path_features(self._tri(spark, rows)).collect()
        }
        # length-1: P(b | a, p) = 1/2
        assert out[("a", "p", "b")] == 0.5
        assert out[("b", "q", "d")] == 1.0
        # length-2 p/q walks from a: via b (1/2 · 1/1) + via c (1/2 · 1/2)
        assert out[("a", "p/q", "d")] == pytest.approx(0.75, abs=1e-9)
        assert out[("a", "p/q", "e")] == pytest.approx(0.25, abs=1e-9)
        # walk mass conservation per (subj, path)
        assert (
            out[("a", "p/q", "d")] + out[("a", "p/q", "e")]
            == pytest.approx(1.0, abs=1e-9)
        )

    def test_support_filter_and_cap(self, spark):
        from ddaugner_spark.operators.kgquery import pra_path_features

        # support-1 edge must vanish entirely
        rows = [("a", "p", "b")] + [("a", "p", "c")] * 2
        out = pra_path_features(self._tri(spark, rows)).collect()
        assert {(r.subj, r.path, r.obj) for r in out} == {("a", "p", "c")}
        assert out[0].prob == 1.0

    def test_hub_mid_capped(self, spark):
        from ddaugner_spark.operators.kgquery import pra_path_features

        # 8 spokes point at hub; hub points at 8 targets — cap 2 keeps
        # <= 2 in-edges and <= 2 out-edges of the hub, so <= 4 paths
        rows = []
        for i in range(8):
            rows += [(f"s{i}", "p", "hub")] * 2 + [("hub", "q", f"t{i}")] * 2
        out = [
            r
            for r in pra_path_features(
                self._tri(spark, rows), fanout_cap=2
            ).collect()
            if "/" in r.path
        ]
        assert 0 < len(out) <= 4
        # degrees recomputed on the capped set: each surviving path is
        # (1/d1)·(1/2) with d1 the spoke's capped out-degree (=1)
        assert all(r.prob == 0.5 for r in out)
