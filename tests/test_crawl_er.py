"""Round-5 crawl-snapshot + entity-resolution + CDC operators:
canonical_url / latest_captures / key_skew_profile (operators/crawl.py),
er_candidate_pairs / resolve_surfaces (operators/er.py),
upsert_triples (operators/triples.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators import crawl, er
from ddaugner_spark.operators.triples import upsert_triples


class TestCanonicalUrl:
    CASES = [
        # (raw, canonical)
        (
            "HTTPS://WWW.Example.COM:443/Doc/12?utm_source=x&id=3&utm_medium=y#frag",
            "https://example.com/Doc/12?id=3",
        ),
        ("http://sub.site.org:80/a/b?q=1", "http://sub.site.org/a/b?q=1"),
        ("https://plain.net/", "https://plain.net/"),
        ("https://host.io/path", "https://host.io/path"),
        ("https://host.io", "https://host.io/"),  # empty path -> '/'
        # NON-default port survives; utm_ param dropped, order preserved
        ("http://x.y.z.co:8080/p?utm_a=1&page=2", "http://x.y.z.co:8080/p?page=2"),
        ("https://www.only-www.com/q", "https://only-www.com/q"),
    ]

    def test_edge_case_battery(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = {
            r.url: r.url_canon for r in crawl.with_canonical_url(df).collect()
        }
        for raw, want in self.CASES:
            assert got[raw] == want, raw

    def test_idempotent(self, spark):
        """canon(canon(u)) == canon(u) — the fixed-point property a
        dedup key must have."""
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        once = crawl.with_canonical_url(df).select(
            F.col("url_canon").alias("url")
        )
        twice = crawl.with_canonical_url(once).collect()
        assert all(r.url == r.url_canon for r in twice)

    def test_host_and_domain(self, spark):
        df = spark.createDataFrame(
            [("https://WWW.A.B.Example.COM:8443/x",)], "url string"
        )
        r = crawl.with_canonical_url(df).collect()[0]
        assert r.host == "a.b.example.com"
        assert r.domain == "example.com"


class TestLatestCaptures:
    def _caps(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )

    def test_latest_wins_and_count(self, spark):
        import datetime as dt

        t = dt.datetime(2024, 1, 1)
        d = self._caps(
            spark,
            [
                ("u1", t, "old"),
                ("u1", t + dt.timedelta(minutes=5), "new"),
                ("u2", t, "only"),
            ],
        )
        got = {r.url: r for r in crawl.latest_captures(d).collect()}
        assert got["u1"].text == "new" and got["u1"].n_captures == 2
        assert got["u2"].text == "only" and got["u2"].n_captures == 1

    def test_timestamp_tie_breaks_by_md5_deterministically(self, spark):
        import datetime as dt
        import hashlib

        t = dt.datetime(2024, 1, 1)
        texts = ["alpha", "beta"]
        d = self._caps(spark, [("u", t, x) for x in texts])
        winner = crawl.latest_captures(d).collect()[0].text
        want = max(texts, key=lambda s: hashlib.md5(s.encode()).hexdigest())
        assert winner == want
        # invariant under repartition (determinism rule)
        winner2 = crawl.latest_captures(d.repartition(7)).collect()[0].text
        assert winner2 == want

    def test_plan_is_partial_aggregate_not_window(self, spark):
        """The scale claim: latest-capture dedup must be a PARTIALLY
        combined aggregate (partial_max below the exchange — one row
        per (partition, url) on the wire), NOT a row_number window
        (which ships and sorts every capture)."""
        import datetime as dt

        d = self._caps(spark, [("u", dt.datetime(2024, 1, 1), "x")])
        plan = crawl.latest_captures(d)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "partial_max" in plan


class TestKeySkewProfile:
    def test_shares_and_rank_ties(self, spark):
        rows = [("hub",)] * 6 + [("a",)] * 2 + [("b",)] * 2
        df = spark.createDataFrame(rows, "k string")
        got = {r.rank: r for r in crawl.key_skew_profile(df, "k", top_n=2).collect()}
        assert got[1].k == "hub" and got[1].n_rows == 6 and got[1].share == 0.6
        assert got[2].k == "a"  # tie with 'b' broken alphabetically
        assert len(got) == 2

    def test_total_reaggregated_not_second_scan(self, spark):
        """Plan pin: the grand total must come from the per-key table
        (re-aggregation + broadcast), so the fact table is scanned
        exactly once."""
        df = spark.createDataFrame([("x",)] * 3, "k string")
        plan = (
            crawl.key_skew_profile(df, "k")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("LocalRelation") + plan.count("Scan") <= 2


class TestErPairs:
    def _surf(self, spark, rows):
        return spark.createDataFrame(rows, "surface string, tag string, n_mentions long")

    def test_typo_variants_only_for_len_ge_4(self, spark):
        s = self._surf(spark, [("spark", "PER", 5), ("abc", "PER", 2)])
        got = {r.surface for r in er.with_typo_surfaces(s).collect()}
        assert got == {"spark", "sark", "abc"}

    def test_blocking_excludes_cross_first_char(self, spark):
        # dist("abc","bbc") = 1 but first chars differ -> never compared
        s = self._surf(spark, [("abc", "PER", 1), ("bbc", "PER", 1)])
        assert er.er_candidate_pairs(s).count() == 0

    def test_threshold_orientation_and_tag_isolation(self, spark):
        s = self._surf(
            spark,
            [
                ("spark", "PER", 1),
                ("sark", "PER", 1),   # dist 1 -> pair
                ("spork", "PER", 1),  # dist 1 from spark -> pair
                ("sxxxxk", "PER", 1), # dist 4 from spark -> no
                ("spark", "LOC", 1),  # same surface, other tag: no cross-tag pair
            ],
        )
        pairs = {(r.tag, r.a, r.b, r.dist) for r in er.er_candidate_pairs(s).collect()}
        assert ("PER", "sark", "spark", 1) in pairs
        assert ("PER", "spark", "spork", 1) in pairs
        assert all(a < b for _, a, b, _ in pairs)  # no mirrors/self
        assert all(t == "PER" or (a != "spark") for t, a, b, _ in pairs)
        assert not any(d > 2 for *_, d in pairs)

    def test_resolve_min_canonical(self, spark, tmp_path):
        pairs = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], "a string, b string"
        )
        got = {
            r.surface: (r.canonical, r.is_alias)
            for r in er.resolve_surfaces(pairs, str(tmp_path / "er")).collect()
        }
        assert got["a"] == ("a", False)
        assert got["b"] == ("a", True)
        assert got["c"] == ("a", True)
        assert got["x"] == ("x", False) and got["y"] == ("x", True)


class TestUpsertTriples:
    def _mk(self, spark, base_rows, cdc_rows):
        base = spark.createDataFrame(
            base_rows, "subj string, pred string, obj string, support long"
        )
        cdc = spark.createDataFrame(
            cdc_rows,
            "subj string, pred string, obj string, op string, ts long, support long",
        )
        return upsert_triples(base, cdc)

    def test_update_delete_insert_untouched(self, spark):
        out = self._mk(
            spark,
            [
                ("a", "p", "x", 3),  # updated
                ("b", "p", "y", 4),  # deleted
                ("c", "p", "z", 5),  # untouched
            ],
            [
                ("a", "p", "x", "u", 10, 30),
                ("b", "p", "y", "d", 10, 0),
                ("n", "p", "w", "u", 20, 1),  # insert
            ],
        )
        got = {(r.subj, r.obj): (r.support, r.last_ts) for r in out.collect()}
        assert got == {
            ("a", "x"): (30, 10),
            ("c", "z"): (5, 0),
            ("n", "w"): (1, 20),
        }

    def test_latest_ts_wins_then_delete_wins_tie(self, spark):
        out = self._mk(
            spark,
            [("a", "p", "x", 1)],
            [
                ("a", "p", "x", "u", 10, 2),
                ("a", "p", "x", "u", 20, 3),   # latest update
                ("a", "p", "x", "d", 20, 0),   # same ts: delete wins
            ],
        )
        assert out.count() == 0

    def test_deterministic_under_repartition(self, spark):
        base = spark.createDataFrame(
            [("a", "p", "x", 1)], "subj string, pred string, obj string, support long"
        )
        cdc = spark.createDataFrame(
            [("a", "p", "x", "u", 10, i) for i in (5, 9, 7)],
            "subj string, pred string, obj string, op string, ts long, support long",
        )
        for n in (1, 8):
            r = upsert_triples(base, cdc.repartition(n)).collect()[0]
            assert (r.support, r.last_ts) == (9, 10)  # support tie-break at equal ts


class TestLinkGraph:
    def test_extract_and_aggregate(self, spark):
        html = (
            '<html><body><a href="https://A.com/x">1</a> text '
            '<a href="http://www.b.com/y?z=1">2</a>'
            '<a href="https://a.com/other">3</a></body></html>'
        )
        pages = spark.createDataFrame(
            [("https://src.com/p", bytearray(html, "utf-8"))], "url string, html binary"
        )
        links = crawl.extract_links(pages)
        assert links.count() == 3
        got = {
            (r.src_host, r.dst_host): r.n_links
            for r in crawl.host_graph(links).collect()
        }
        # hosts lowercased + www-stripped; a.com edge weight folds to 2
        assert got == {("src.com", "a.com"): 2, ("src.com", "b.com"): 1}

    def test_no_links_no_rows(self, spark):
        pages = spark.createDataFrame(
            [("https://s.com/p", bytearray(b"<html>plain</html>"))],
            "url string, html binary",
        )
        assert crawl.extract_links(pages).count() == 0


class TestAnchors:
    def test_extract_href_and_text(self, spark):
        html = (
            '<html><body><a href="https://a.com/x">Apple Inc</a> filler '
            '<a href="http://www.b.com/y">Banana</a>'
            '<a href="https://a.com/z">Apple Inc</a></body></html>'
        )
        pages = spark.createDataFrame(
            [("https://s.com/p", bytearray(html, "utf-8"))],
            "url string, html binary",
        )
        rows = sorted(
            (r.target_url, r.anchor)
            for r in crawl.extract_anchors(pages).collect()
        )
        assert rows == [
            ("http://www.b.com/y", "Banana"),
            ("https://a.com/x", "Apple Inc"),
            ("https://a.com/z", "Apple Inc"),
        ]

    def test_summary_counts_and_tiebreak(self, spark):
        # a.com: 'X'x2, 'Y'x2 (count tie -> lexically smallest wins),
        # 'Z'x1; b.com single anchor
        rows = [
            ("u", "https://a.com/1", "X"),
            ("u", "https://a.com/2", "X"),
            ("u", "https://www.a.com/3", "Y"),
            ("u", "https://a.com/4", "Y"),
            ("u", "https://a.com/5", "Z"),
            ("u", "https://b.com/1", "Solo"),
        ]
        anchors = spark.createDataFrame(
            rows, "url string, target_url string, anchor string"
        )
        got = {r.dst_host: r for r in crawl.anchor_summary(anchors).collect()}
        a = got["a.com"]
        assert (a.n_links, a.n_anchor_forms, a.top_anchor, a.top_count) == (
            5, 3, "X", 2,
        )
        b = got["b.com"]
        assert (b.n_links, b.n_anchor_forms, b.top_anchor, b.top_count) == (
            1, 1, "Solo", 1,
        )


class TestResolveRedirects:
    def _resolve(self, spark, pairs, tmp_path, **kw):
        red = spark.createDataFrame(pairs, "src string, dst string")
        stats = {}
        out = crawl.resolve_redirects(
            red, stage_dir=str(tmp_path / "redir"), stats=stats, **kw
        )
        return {r.src: (r.final_url, r.hops) for r in out.collect()}, stats

    def test_chain_resolves_with_exact_hops(self, spark, tmp_path):
        chain = [(f"u{i}", f"u{i-1}") for i in range(1, 8)]  # depth 7
        got, stats = self._resolve(spark, chain, tmp_path)
        assert got == {f"u{i}": ("u0", i) for i in range(1, 8)}
        # pointer jumping: depth-7 chain needs ceil(log2(7)) = 3
        # doubling rounds (+1 round to observe the fixed point)
        assert len(stats["rounds"]) <= 4

    def test_cycle_yields_null(self, spark, tmp_path):
        got, _ = self._resolve(
            spark, [("a", "b"), ("b", "a"), ("c", "a")], tmp_path, max_jumps=4
        )
        # cycle members AND feeders: no terminal, and the accumulated
        # hop count is a loop artifact — withheld, not reported
        assert got["a"] == (None, None)
        assert got["b"] == (None, None)
        assert got["c"] == (None, None)

    def test_cycle_iterates_only_the_active_remainder(self, spark, tmp_path):
        """Settled chains leave the iterating set: with one 2-cycle next
        to many settled rows, later rounds see only the cycle rows."""
        pairs = [("x", "y"), ("y", "x")] + [(f"u{i}", "t") for i in range(20)]
        got, stats = self._resolve(spark, pairs, tmp_path, max_jumps=5)
        assert got["u3"] == ("t", 1)
        assert got["x"] == (None, None)
        # after round 1 the 20 chain rows are settled; every subsequent
        # round's active set is exactly the 2 cycle rows
        assert [r["n_active"] for r in stats["rounds"]][1:] == [2] * (
            len(stats["rounds"]) - 1
        )

    def test_branching_trees_fold_to_roots(self, spark, tmp_path):
        pairs = [("x1", "r"), ("x2", "r"), ("y", "x1")]
        got, _ = self._resolve(spark, pairs, tmp_path)
        assert got == {"x1": ("r", 1), "x2": ("r", 1), "y": ("r", 2)}


class TestFrontierSchedule:
    def test_politeness_invariant_and_priority_order(self, spark):
        rows = [
            ("https://a.com/1", "a.com", 5),
            ("https://a.com/2", "a.com", 9),
            ("https://a.com/3", "a.com", 9),
            ("https://b.com/1", "b.com", 1),
        ]
        fr = spark.createDataFrame(rows, "url string, host string, priority long")
        out = crawl.frontier_schedule(fr).collect()
        by_url = {r.url: r.tick for r in out}
        # each host: at most one url per tick; best priority first,
        # priority ties break on url
        assert by_url["https://a.com/2"] == 1
        assert by_url["https://a.com/3"] == 2
        assert by_url["https://a.com/1"] == 3
        assert by_url["https://b.com/1"] == 1
        for tick in {r.tick for r in out}:
            hosts = [r.host for r in out if r.tick == tick]
            assert len(hosts) == len(set(hosts))

    def test_max_per_host_budget(self, spark):
        rows = [(f"https://h.com/{i}", "h.com", i) for i in range(10)]
        fr = spark.createDataFrame(rows, "url string, host string, priority long")
        out = crawl.frontier_schedule(fr, max_per_host=3)
        assert out.count() == 3
        assert {r.priority for r in out.collect()} == {9, 8, 7}


def _eager_er_cells(er_mod, surf):
    """Eager union-find replay of ``_er_eval_cells``: the (pred, gold)
    → count contingency cells every cluster-eval metric folds, built
    with plain Python dict union-find on collected surfaces."""
    from collections import defaultdict

    surfaces = [(r["surface"], r["tag"]) for r in surf.collect()]
    amp_pairs = [
        (r["tag"], r["a"], r["b"])
        for r in er_mod.er_candidate_pairs(
            er_mod.with_typo_surfaces(surf), max_dist=2
        ).collect()
    ]
    recs = sorted(
        {f"{t}|{s}" for s, t in surfaces}
        | {f"{t}|{s[0]}{s[2:]}" for s, t in surfaces if len(s) >= 4}
    )

    def find(x, p):
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(a, b, p):
        ra, rb = find(a, p), find(b, p)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)

    gp, pp = {}, {}
    for s, t in surfaces:
        if len(s) >= 4:
            union(f"{t}|{s[0]}{s[2:]}", f"{t}|{s}", gp)
    for t, a, b in amp_pairs:
        union(f"{t}|{a}", f"{t}|{b}", pp)
    # canonical = lexicographic min of each component (path-compress then
    # re-minimize per component)
    def labels(p):
        comp = defaultdict(list)
        for x in recs:
            comp[find(x, p)].append(x)
        return {x: min(members) for members in comp.values() for x in members}

    gl, pl = labels(gp), labels(pp)
    cells = defaultdict(int)
    for x in recs:
        cells[(pl[x], gl[x])] += 1
    return recs, dict(cells)


def test_b3_cluster_eval_matches_python(spark, sf_dir, tmp_path):
    """B³ P/R/F1 == eager union-find reference (same truth edges, same
    candidate graph, same per-cell micro-quantization)."""
    from collections import defaultdict

    from ddaugner_spark.operators import er as er_mod
    from ddaugner_spark.operators import mentions as mentions_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surf = er_mod.distinct_surfaces(mentions_mod.mentions_df(docs))
    row = (
        er_mod.b3_cluster_eval(surf, max_dist=2, stage_dir=str(tmp_path / "b3"))
        .collect()[0]
        .asDict()
    )
    recs, cells = _eager_er_cells(er_mod, surf)
    pc, gc = defaultdict(int), defaultdict(int)
    for (p, g), i in cells.items():
        pc[p] += i
        gc[g] += i
    pqs = sum(round(1000000.0 * i * i / pc[p]) for (p, g), i in cells.items())
    rqs = sum(round(1000000.0 * i * i / gc[g]) for (p, g), i in cells.items())
    n = len(recs)
    P = pqs / n / 1000000.0
    R = rqs / n / 1000000.0
    assert row["n_records"] == n
    assert row["b3_precision"] == round(P, 6)
    assert row["b3_recall"] == round(R, 6)
    assert row["b3_f1"] == round(2.0 * P * R / (P + R), 6)
    assert 0.0 < row["b3_f1"] <= 1.0


def test_muc_and_ari_match_python(spark, sf_dir, tmp_path):
    """MUC link-based P/R/F1 and the Adjusted Rand Index == the eager
    folds of the same union-find contingency cells B³ is pinned
    against — three metrics, one shared cell derivation."""
    from collections import defaultdict

    from ddaugner_spark.operators import er as er_mod
    from ddaugner_spark.operators import mentions as mentions_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surf = er_mod.distinct_surfaces(mentions_mod.mentions_df(docs))
    recs, cells = _eager_er_cells(er_mod, surf)
    n = len(recs)

    # --- MUC: per-cluster (size, shatter count) folds
    gsz, gparts = defaultdict(int), defaultdict(int)
    psz, pparts = defaultdict(int), defaultdict(int)
    for (p, g), i in cells.items():
        gsz[g] += i
        gparts[g] += 1
        psz[p] += i
        pparts[p] += 1
    rn = sum(gsz[g] - gparts[g] for g in gsz)
    rd = sum(gsz[g] - 1 for g in gsz)
    pn = sum(psz[p] - pparts[p] for p in psz)
    pd = sum(psz[p] - 1 for p in psz)
    row = (
        er_mod.muc_cluster_eval(surf, max_dist=2, stage_dir=str(tmp_path / "muc"))
        .collect()[0]
        .asDict()
    )
    assert row["n_records"] == n
    P_muc = pn / pd if pd > 0 else None
    R_muc = rn / rd if rd > 0 else None
    assert row["muc_precision"] == (round(P_muc, 6) if P_muc is not None else None)
    assert row["muc_recall"] == (round(R_muc, 6) if R_muc is not None else None)
    if P_muc and R_muc:
        assert row["muc_f1"] == round(2 * P_muc * R_muc / (P_muc + R_muc), 6)
        # the amplifier guarantees real clusters on both sides
        assert 0.0 < row["muc_f1"] <= 1.0

    # --- ARI: exact binomial sums + chance correction
    c2 = lambda x: x * (x - 1) // 2
    sij = sum(c2(i) for i in cells.values())
    sa = sum(c2(s) for s in psz.values())
    sb = sum(c2(s) for s in gsz.values())
    n2 = c2(n)
    exp = sa * sb / n2
    ari = (sij - exp) / ((sa + sb) / 2.0 - exp)
    row = (
        er_mod.ari_cluster_eval(surf, max_dist=2, stage_dir=str(tmp_path / "ari"))
        .collect()[0]
        .asDict()
    )
    assert row["n_records"] == n
    assert row["sum_cell_c2"] == sij
    assert row["sum_pred_c2"] == sa
    assert row["sum_gold_c2"] == sb
    assert row["ari"] == round(ari, 6)
    assert -0.5 <= row["ari"] <= 1.0


def test_ari_degenerate_null(spark, tmp_path):
    """All-singleton surfaces (< 4 chars -> no truth variants, no
    candidate pairs): both partitions are all singletons, the ARI
    denominator is 0 and the metric must be NULL, not 1.0."""
    from ddaugner_spark.operators import er as er_mod

    surf = spark.createDataFrame(
        [("ab", "PER", 1), ("cd", "PER", 1), ("ef", "LOC", 1)],
        "surface string, tag string, n_mentions long",
    )
    row = (
        er_mod.ari_cluster_eval(surf, stage_dir=str(tmp_path / "ari0"))
        .collect()[0]
        .asDict()
    )
    assert row["n_records"] == 3
    assert row["sum_cell_c2"] == 0 and row["sum_pred_c2"] == 0
    assert row["ari"] is None
    muc = (
        er_mod.muc_cluster_eval(surf, stage_dir=str(tmp_path / "muc0"))
        .collect()[0]
        .asDict()
    )
    # MUC ignores singletons: both denominators 0 -> all three NULL
    assert muc["muc_precision"] is None
    assert muc["muc_recall"] is None
    assert muc["muc_f1"] is None


class TestSortedNeighborhood:
    def _surf(self, spark, names):
        return spark.createDataFrame(
            [(s, "PER") for s in names], "surface string, tag string"
        )

    def test_window_bound_and_gaps(self, spark, tmp_path):
        from ddaugner_spark.operators.er import sorted_neighborhood_pairs

        out = sorted_neighborhood_pairs(
            self._surf(spark, ["a", "b", "c", "d", "e"]),
            window=3, stage_dir=str(tmp_path / "snm"),
        ).collect()
        # n=5, w=3: 3+3+2+1 = 9 candidate pairs, gaps within the window
        assert len(out) == 9
        assert all(1 <= r["gap"] <= 3 for r in out)
        got = {(r["surface_a"], r["surface_b"]) for r in out}
        assert ("a", "d") in got and ("a", "e") not in got

    def test_catches_pair_equality_blocking_misses(self, spark, tmp_path):
        """'oscar'/'qscar' share no first char (the q_er_pairs block
        key) but sort adjacent under the SNM key -> candidate with
        dist 1, flagged as a match."""
        from ddaugner_spark.operators.er import sorted_neighborhood_pairs

        out = sorted_neighborhood_pairs(
            self._surf(spark, ["oscar", "qscar", "zzz top", "aaa"]),
            window=1, max_dist=2, stage_dir=str(tmp_path / "snm"),
        ).collect()
        m = {(r["surface_a"], r["surface_b"]): r for r in out}
        assert m[("oscar", "qscar")]["dist"] == 1
        assert m[("oscar", "qscar")]["is_match"] is True

    def test_key_normalization_differential(self, spark, tmp_path):
        """Python replay: lowercase + strip non-alphanumerics, sort by
        (key, surface, tag), pairs within the window."""
        import re
        from ddaugner_spark.operators.er import sorted_neighborhood_pairs

        names = ["Ab-c", "abc", "A B C", "abd", "xy!z", "xyz", "w0rd",
                 "word", "Word Inc."]
        w = 2
        rows = sorted(
            (re.sub(r"[^a-z0-9]", "", s.lower()), s, "PER") for s in names
        )
        want = set()
        for i in range(len(rows)):
            for j in range(i + 1, min(i + w + 1, len(rows))):
                want.add((rows[i][1], rows[j][1], j - i))
        got = {
            (r["surface_a"], r["surface_b"], r["gap"])
            for r in sorted_neighborhood_pairs(
                self._surf(spark, names), window=w,
                stage_dir=str(tmp_path / "snm"),
            ).collect()
        }
        assert got == want


def test_vi_cluster_eval_matches_quantized_replay(spark, sf_dir, tmp_path):
    """VI == the eager quantized entropy/MI folds of the same shared
    union-find contingency cells (fourth lens of the family)."""
    import math
    from collections import defaultdict

    from ddaugner_spark.operators import er as er_mod
    from ddaugner_spark.operators import mentions as mentions_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surf = er_mod.distinct_surfaces(mentions_mod.mentions_df(docs))
    recs, cells = _eager_er_cells(er_mod, surf)
    n = len(recs)
    psz, gsz = defaultdict(int), defaultdict(int)
    for (p, g), i in cells.items():
        psz[p] += i
        gsz[g] += i

    def entq(sizes):
        return sum(
            round(1e9 * (s / n) * math.log(s / n)) for s in sizes.values()
        )

    hpq, hgq = entq(psz), entq(gsz)
    miq = sum(
        round(1e9 * (i / n) * math.log((i * n) / (psz[p] * gsz[g])))
        for (p, g), i in cells.items()
    )
    row = (
        er_mod.vi_cluster_eval(surf, max_dist=2, stage_dir=str(tmp_path / "vi"))
        .collect()[0]
        .asDict()
    )
    h_pred, h_gold, mi = -hpq / 1e9, -hgq / 1e9, miq / 1e9
    assert row["n_records"] == n
    assert row["h_pred"] == round(h_pred, 6)
    assert row["h_gold"] == round(h_gold, 6)
    assert row["mi"] == round(mi, 6)
    assert row["vi"] == round(h_pred + h_gold - 2.0 * mi, 6)
    # VI is a metric: non-negative, bounded by ln n
    assert -1e-9 <= row["vi"] <= math.log(n) + 1e-9


def test_change_rate_hand_captures(spark):
    import datetime as dt

    from ddaugner_spark.operators.crawl import change_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: A A B over 10 minutes -> 1 change, 144/day
        ("u1", t0, "A"),
        ("u1", t0 + dt.timedelta(minutes=4), "A"),
        ("u1", t0 + dt.timedelta(minutes=10), "B"),
        # u2: single capture -> cold-start sentinel
        ("u2", t0, "Z"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    got = {r.url: r for r in change_rate(df).collect()}
    assert (got["u1"].n_captures, got["u1"].n_changes, got["u1"].span_min) == (
        3, 1, 10,
    )
    assert got["u1"].change_rate == 144.0
    assert (got["u2"].n_changes, got["u2"].span_min, got["u2"].change_rate) == (
        0, 0, 0.0,
    )


def test_fs_em_matches_eager_replay(spark, tmp_path):
    """Unsupervised FS-EM == the eager quantized EM replay, and on a
    mixture where one feature separates two pair populations the
    learned m must exceed u for it."""
    from ddaugner_spark.operators.er import fs_em_weights

    # 60 "match-ish" pairs agree on f0+f1; 140 noise pairs agree on
    # nothing or f1 only
    rows = (
        [(True, True, False)] * 60
        + [(False, True, False)] * 40
        + [(False, False, False)] * 100
        + [(True, False, True)] * 5
    )
    df = spark.createDataFrame(rows, "f0 boolean, f1 boolean, f2 boolean")
    got = {
        r.feature: r
        for r in fs_em_weights(
            df, ["f0", "f1", "f2"], iters=2,
            stage_dir=str(tmp_path / "fsem"),
        ).collect()
    }

    # eager replay
    from collections import Counter

    pats = Counter(rows)
    Q = 10**12
    m = [0.9] * 3
    u = [0.1] * 3
    p = 0.1

    def clamp(num, den):
        r = num / den if den > 0 else 0.0
        return min(max(r, 1e-6), 1.0 - 1e-6)

    for _ in range(2):
        n = swq = sw1q = 0
        smq = [0] * 3
        suq = [0] * 3
        for pat, c in pats.items():
            pm = pu = 1.0
            for i in range(3):
                pm *= m[i] if pat[i] else 1.0 - m[i]
                pu *= u[i] if pat[i] else 1.0 - u[i]
            w = (p * pm) / ((p * pm) + (1.0 - p) * pu)
            n += c
            wq = round(Q * c * w)
            w1q = round(Q * c * (1.0 - w))
            swq += wq
            sw1q += w1q
            for i in range(3):
                if pat[i]:
                    smq[i] += wq
                    suq[i] += w1q
        m = [clamp(smq[i], swq) for i in range(3)]
        u = [clamp(suq[i], sw1q) for i in range(3)]
        p = clamp(swq, Q * n)
    import math

    for i, f in enumerate(("f0", "f1", "f2")):
        assert got[f].m == pytest.approx(round(m[i], 6), abs=1e-6)
        assert got[f].u == pytest.approx(round(u[i], 6), abs=1e-6)
        assert got[f].p == pytest.approx(round(p, 6), abs=1e-6)
        assert got[f].w_agree == pytest.approx(
            round(math.log2(m[i] / u[i]), 6), abs=1e-6
        )
    # the separating feature is learned: agreeing on f0 is evidence FOR
    # a match, so m0 > u0 and the agreement weight is positive
    assert got["f0"].m > got["f0"].u and got["f0"].w_agree > 0


def test_fm_matches_cell_replay_and_ari_consistency(spark, sf_dir, tmp_path):
    """FM == eager binomial folds of the shared cells; consistency with
    ARI's pair counts (same TP/TP+FP/TP+FN base quantities)."""
    import math
    from collections import defaultdict

    from ddaugner_spark.operators import er as er_mod
    from ddaugner_spark.operators import mentions as mentions_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surf = er_mod.distinct_surfaces(mentions_mod.mentions_df(docs))
    recs, cells = _eager_er_cells(er_mod, surf)
    c2 = lambda x: x * (x - 1) // 2
    tp = sum(c2(i) for i in cells.values())
    psz, gsz = defaultdict(int), defaultdict(int)
    for (p, g), i in cells.items():
        psz[p] += i
        gsz[g] += i
    tpfp = sum(c2(s) for s in psz.values())
    tpfn = sum(c2(s) for s in gsz.values())
    row = (
        er_mod.fm_cluster_eval(surf, max_dist=2, stage_dir=str(tmp_path / "fm"))
        .collect()[0]
        .asDict()
    )
    assert row["n_records"] == len(recs)
    assert (row["tp"], row["fp"], row["fn"]) == (tp, tpfp - tp, tpfn - tp)
    assert row["fm"] == round(tp / math.sqrt(tpfp * tpfn), 6)
    # FM is the geometric mean of pair precision and recall
    prec, rec = tp / tpfp, tp / tpfn
    assert row["fm"] == pytest.approx(math.sqrt(prec * rec), abs=1e-6)
    assert 0.0 < row["fm"] <= 1.0
