"""Round-5 engine additions: retrieval (TF-IDF / postings / BM25),
PII redaction, PMI co-mention edge weights, and bigram-LM doc scoring.

All expectations are hand-computed (or computed with the same IEEE-double
formula in Python) on tiny literal corpora — the sf-scale differential
against the DuckDB twins lives in tools/parity_check.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators import graph, privacy, retrieval, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRedactPii:
    def test_all_four_categories(self, spark):
        out = privacy.redact_pii(
            _docs(
                spark,
                [(1, "mail bob@example.com ip 10.0.0.1 tel +14155501234 ref 123456789")],
            )
        ).collect()[0]
        assert (out.n_emails, out.n_ips, out.n_phones, out.n_ids) == (1, 1, 1, 1)
        assert (
            out.clean_text
            == "mail [EMAIL] ip [IP] tel [PHONE] ref [ID]"
        )

    def test_order_email_consumes_inner_ip(self, spark):
        # the dotted quad inside the email's domain is consumed by the
        # email rule and must NOT be double-counted by the IP rule
        out = privacy.redact_pii(_docs(spark, [(1, "x a@10.0.0.1.com y")])).collect()[0]
        assert (out.n_emails, out.n_ips) == (1, 0)
        assert out.clean_text == "x [EMAIL] y"

    def test_order_phone_before_bare_id_run(self, spark):
        # +prefixed long runs are phones; bare long runs are IDs
        out = privacy.redact_pii(
            _docs(spark, [(1, "call +123456789012 or 999888777666")])
        ).collect()[0]
        assert (out.n_phones, out.n_ids) == (1, 1)
        assert out.clean_text == "call [PHONE] or [ID]"

    def test_short_digit_runs_survive(self, spark):
        out = privacy.redact_pii(_docs(spark, [(1, "year 2026 pin 12345678")])).collect()[0]
        assert out.n_ids == 0
        assert out.clean_text == "year 2026 pin 12345678"

    def test_null_text_is_empty_doc(self, spark):
        out = privacy.redact_pii(_docs(spark, [(1, None)])).collect()[0]
        assert (out.n_emails, out.n_ips, out.n_phones, out.n_ids) == (0, 0, 0, 0)
        assert out.clean_text == ""


class TestTfidf:
    def test_hand_computed_corpus(self, spark):
        docs = _docs(spark, [(1, "a a b"), (2, "a c"), (3, "b b c c c")])
        got = {
            (r.doc_id, r.token): (r.tf, r.df, r.tfidf, r.rank)
            for r in retrieval.tfidf_top_terms(docs, k=5).collect()
        }
        idf = math.log(4 / 3) + 1  # every token has df=2, N=3
        assert got[(1, "a")] == (2, 2, round(2 * idf, 6), 1)
        assert got[(1, "b")] == (1, 2, round(idf, 6), 2)
        assert got[(3, "c")][3] == 1  # tf=3 beats b's tf=2
        assert got[(3, "b")][3] == 2

    def test_k_bounds_output(self, spark):
        docs = _docs(spark, [(1, "a b c d e f g")])
        assert retrieval.tfidf_top_terms(docs, k=3).count() == 3

    def test_tie_breaks_on_token(self, spark):
        # equal tf & df -> equal score -> ascending token order
        rows = retrieval.tfidf_top_terms(_docs(spark, [(1, "b a")]), k=2).collect()
        ranked = sorted((r.rank, r.token) for r in rows)
        assert ranked == [(1, "a"), (2, "b")]


class TestPostings:
    def test_df_counts_and_bounded_list(self, spark):
        docs = _docs(spark, [(i, "x x y") for i in range(1, 6)])
        got = {r.token: (r.df, r.postings) for r in retrieval.postings(docs, 3).collect()}
        # df counts DOCS (not occurrences); list is capped at 3, ascending
        assert got["x"] == (5, "1,2,3")
        assert got["y"] == (5, "1,2,3")

    def test_small_df_keeps_all(self, spark):
        docs = _docs(spark, [(7, "z"), (3, "z")])
        got = {r.token: (r.df, r.postings) for r in retrieval.postings(docs, 16).collect()}
        assert got["z"] == (2, "3,7")


class TestBm25:
    def test_formula_matches_python_double(self, spark):
        docs = _docs(spark, [(1, "x x x"), (2, "x y"), (3, "y y")])
        got = {r.doc_id: (r.score, r.rank) for r in
               retrieval.bm25_scores(docs, ["x"], k=10).collect()}
        idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
        avgdl = 7 / 3

        def bm25(tf, dl, k1=1.2, b=0.75):
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4)

        assert got[1] == (bm25(3, 3), 1)
        assert got[2] == (bm25(1, 2), 2)
        assert 3 not in got  # no query term -> no row

    def test_top_k_bound(self, spark):
        docs = _docs(spark, [(i, "q") for i in range(20)])
        assert retrieval.bm25_scores(docs, ["q"], k=10).count() == 10


class TestPmiEdges:
    def test_hand_computed_graph(self, spark):
        m = spark.createDataFrame(
            [
                (1, 0, "A"), (1, 0, "B"),
                (1, 1, "A"), (1, 1, "B"),
                (2, 0, "A"), (2, 0, "C"),
                (2, 1, "B"),
            ],
            "doc_id long, sent_id int, surface string",
        )
        got = {(r.a, r.b): (r.c_ab, r.pmi) for r in graph.pmi_edges(m).collect()}
        # N=4 sents; c(A)=3 c(B)=3 c(C)=1
        assert got[("A", "B")] == (2, round(math.log(4 * 2 / 9), 6))
        assert got[("A", "C")] == (1, round(math.log(4 / 3), 6))
        assert len(got) == 2

    def test_duplicate_mentions_in_sentence_count_once(self, spark):
        m = spark.createDataFrame(
            [(1, 0, "A"), (1, 0, "A"), (1, 0, "B")],
            "doc_id long, sent_id int, surface string",
        )
        got = graph.pmi_edges(m).collect()
        assert [(r.a, r.b, r.c_ab, r.pmi) for r in got] == [("A", "B", 1, 0.0)]


class TestBigramLm:
    def test_word_bigrams(self, spark):
        got = sorted(
            (r.doc_id, r.w1, r.w2)
            for r in textstats.word_bigrams(
                _docs(spark, [(1, "a b a b"), (2, "x"), (3, ""), (4, None)])
            ).collect()
        )
        assert got == [(1, "a", "b"), (1, "b", "a"), (1, "a", "b")] or got == sorted(
            [(1, "a", "b"), (1, "b", "a"), (1, "a", "b")]
        )

    def test_hand_computed_nll(self, spark):
        docs = _docs(spark, [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)])
        got = {r.doc_id: (r.n_bigrams, r.nll) for r in
               textstats.lm_bigram_scores(docs).collect()}
        # corpus: C(a,b)=3 C(b,a)=1 C(b,c)=1 ; C(a·)=3 C(b·)=2
        d1 = round(-(2 * math.log(3 / 3) + 1 * math.log(1 / 2)) / 3, 4)
        d2 = round(-(1 * math.log(3 / 3) + 1 * math.log(1 / 2)) / 2, 4)
        assert got[1] == (3, d1)
        assert got[2] == (2, d2)
        assert got[3] == (0, 0.0)  # single-token doc: no bigrams
        assert got[4] == (0, 0.0)  # NULL text: empty doc

    def test_dominant_continuation_scores_lower_nll(self, spark):
        # self-trained and unsmoothed: a corpus-unique bigram has
        # P=1 (nll contribution 0), so "surprising" means a RARE
        # continuation of a COMMON first word, not a unique pair
        docs = _docs(
            spark,
            [(1, ("the cat " * 10).strip()), (2, "the cat the dog the bird the fish")],
        )
        got = {r.doc_id: r.nll for r in textstats.lm_bigram_scores(docs).collect()}
        assert got[1] < got[2]


class TestRrfFuse:
    def _lists(self, spark, a, b):
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, rank long")  # noqa: E731
        return mk(a), mk(b)

    def test_both_lists_beat_single_list(self, spark):
        # doc 1 ranks 2nd in both lists; docs 10/20 rank 1st in one
        # list only — RRF puts the consistently-good doc on top
        a, b = self._lists(spark, [(10, 1), (1, 2)], [(20, 1), (1, 2)])
        out = retrieval.rrf_fuse(a, b, k=10).collect()
        assert out[0].doc_id == 1
        assert out[0].rrf == round(2 / 62, 6)
        assert {r.doc_id for r in out} == {1, 10, 20}

    def test_absent_rank_is_zero_sentinel(self, spark):
        a, b = self._lists(spark, [(1, 1)], [(2, 1)])
        got = {r.doc_id: (r.rank_a, r.rank_b) for r in
               retrieval.rrf_fuse(a, b, k=10).collect()}
        assert got == {1: (1, 0), 2: (0, 1)}

    def test_tie_breaks_on_id_and_k_caps(self, spark):
        a, b = self._lists(
            spark, [(i, i) for i in range(1, 30)], [(i, i) for i in range(1, 30)]
        )
        out = retrieval.rrf_fuse(a, b, k=5).collect()
        assert [r.doc_id for r in out] == [1, 2, 3, 4, 5]
        assert [r.fused_rank for r in out] == [1, 2, 3, 4, 5]


def test_k_anonymity_ladder_levels(spark):
    from ddaugner_spark.operators.privacy import k_anonymity_ladder

    rows = []
    did = 0
    def add(n, lang, source, n_chars):
        nonlocal did
        for _ in range(n):
            rows.append((did, "t", lang, source, n_chars)); did += 1
    add(6, "en", "s1", 50)    # level 0 group (n0 = 6)
    add(3, "en", "s2", 50)    # n0 3, n1 4 -> level 2 via lang total 10
    add(1, "en", "s2", 150)
    add(2, "fr", "s1", 50)    # suppressed: lang total 2
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.lang, r.source, r.len_decile): (r.n0, r.level, r.anon_n)
        for r in k_anonymity_ladder(docs, k=5).collect()
    }
    assert got == {
        ("en", "s1", 0): (6, 0, 6),
        ("en", "s2", 0): (3, 2, 10),
        ("en", "s2", 1): (1, 2, 10),
        ("fr", "s1", 0): (2, 3, -1),
    }


def test_k_anonymity_decile_caps_at_nine(spark):
    from ddaugner_spark.operators.privacy import k_anonymity_ladder

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 5000) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = k_anonymity_ladder(docs, k=5).collect()
    assert [(r.len_decile, r.level, r.anon_n) for r in rows] == [(9, 0, 5)]


def test_mmr_select_hand_fixture(spark):
    """2-D fixture, hand-computed: the duplicate-of-query wins step 1,
    then diversity takes over; ties break on vec_id; negative scores
    flow through the packed key; supply exhaustion stops early."""
    from ddaugner_spark.operators.retrieval import mmr_select

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]),
         (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = [(r.step, r.vec_id, r.rel, r.max_sim, r.score)
            for r in mmr_select(emb, k=5).collect()]
    assert rows == [
        (1, 1, 1000000, 0, 1000000),
        (2, 2, 900000, 900000, 0),
        (3, 3, 0, 100000, -100000),
        (4, 4, -1000000, 0, -1000000),
    ]
