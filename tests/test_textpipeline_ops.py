"""Round-5 training-data-pipeline operators: sentence_texts /
repetition_stats (textstats), sentence_dedup (dedup), stratified
sampling (sampling).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddaugner_spark import config
from ddaugner_spark.operators import dedup, sampling, textstats
from ddaugner_spark.operators.sentences import tokens_long

T = config.SENT_TERM  # "the"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sents(spark, rows):
    out = textstats.sentence_texts(_docs(spark, rows))
    return sorted(tuple(r) for r in out.collect())


class TestSentenceTexts:
    def test_basic_split(self, spark):
        # sentence ENDS at the terminator; tail after last term = final sentence
        got = _sents(spark, [(1, f"a b {T} c {T} d")])
        assert got == [(1, 0, f"a b {T}"), (1, 1, f"c {T}"), (1, 2, "d")]

    def test_trailing_terminator_leaves_no_empty_sentence(self, spark):
        got = _sents(spark, [(1, f"a b {T}")])
        assert got == [(1, 0, f"a b {T}")]

    def test_consecutive_terminators_are_one_token_sentences(self, spark):
        got = _sents(spark, [(1, f"{T} {T} x")])
        assert got == [(1, 0, T), (1, 1, T), (1, 2, "x")]

    def test_empty_and_null_docs_have_no_sentences(self, spark):
        got = _sents(spark, [(1, ""), (2, None), (3, "x")])
        assert got == [(3, 0, "x")]

    def test_sent_ids_match_tokens_long(self, spark):
        """The narrow splitter's sent_id == the windowed running-count id
        (the two formulations must join consistently)."""
        docs = _docs(
            spark,
            [(1, f"a {T} {T} b c {T}"), (2, "x y z"), (3, f"{T}")],
        )
        via_window = (
            tokens_long(docs)
            .groupBy("doc_id", "sent_id")
            .agg(F.count("*").alias("n"))
            .select("doc_id", "sent_id")
        )
        via_split = textstats.sentence_texts(docs).select("doc_id", "sent_id")
        assert via_window.subtract(via_split).count() == 0
        assert via_split.subtract(via_window).count() == 0

    def test_roundtrip_concat_is_original_text(self, spark):
        """Sentences partition the token stream: joining them back with
        spaces reconstructs the document."""
        text = f"a b {T} {T} c d e {T} f"
        out = textstats.sentence_texts(_docs(spark, [(1, text)]))
        parts = [
            r.sent_text
            for r in out.orderBy("sent_id").collect()
        ]
        assert " ".join(parts) == text


class TestRepetitionStats:
    def test_known_fractions(self, spark):
        # 2-grams of "x y x y x": [x y, y x, x y, y x] → top 2/4
        # sentences: none (no terminator) → 1 sentence, 0 dup
        out = textstats.repetition_stats(_docs(spark, [(1, "x y x y x")]))
        r = out.collect()[0]
        assert (r.n_grams2, r.top_gram_count, r.top_gram_frac) == (4, 2, 0.5)
        assert (r.n_sents, r.n_distinct_sents, r.dup_sent_frac) == (1, 1, 0.0)

    def test_duplicate_sentences(self, spark):
        text = f"a b {T} a b {T} c {T}"  # "a b the" ×2, "c the" ×1
        r = textstats.repetition_stats(_docs(spark, [(1, text)])).collect()[0]
        assert (r.n_sents, r.n_distinct_sents) == (3, 2)
        assert r.dup_sent_frac == round(1 / 3, 4)

    def test_degenerate_docs(self, spark):
        out = textstats.repetition_stats(
            _docs(spark, [(1, ""), (2, None), (3, "solo")])
        )
        rows = {r.doc_id: r for r in out.collect()}
        assert len(rows) == 3
        for d in (1, 2):
            assert rows[d].n_grams2 == 0 and rows[d].top_gram_frac == 0.0
            assert rows[d].n_sents == 0 and rows[d].dup_sent_frac == 0.0
        assert rows[3].n_grams2 == 0 and rows[3].n_sents == 1


class TestSentenceDedup:
    def test_first_occurrence_wins(self, spark):
        docs = _docs(
            spark,
            [
                (1, f"dup a {T} unique one"),
                (2, f"dup a {T} unique two"),  # sentence "dup a the" already seen
            ],
        )
        rows = {r.doc_id: r for r in dedup.sentence_dedup(docs).collect()}
        assert (rows[1].n_sents, rows[1].n_kept, rows[1].n_dropped) == (2, 2, 0)
        assert (rows[2].n_sents, rows[2].n_kept, rows[2].n_dropped) == (2, 1, 1)

    def test_within_doc_duplicates_also_collapse(self, spark):
        docs = _docs(spark, [(1, f"a {T} a {T}")])
        r = dedup.sentence_dedup(docs).collect()[0]
        assert (r.n_sents, r.n_kept, r.n_dropped) == (2, 1, 1)

    def test_empty_doc_keeps_zero_row(self, spark):
        rows = {r.doc_id: r for r in dedup.sentence_dedup(
            _docs(spark, [(1, ""), (2, "x")])
        ).collect()}
        assert (rows[1].n_sents, rows[1].n_kept, rows[1].n_dropped) == (0, 0, 0)


class TestStratifiedSample:
    @pytest.fixture()
    def corpus(self, spark):
        rows = [(i, "t", ["en", "de", "fr"][i % 3]) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_rate_bounds(self, corpus):
        assert sampling.stratified_sample(corpus, {}, default_mille=1000).count() == 300
        assert sampling.stratified_sample(corpus, {}, default_mille=0).count() == 0

    def test_unlisted_strata_use_default(self, corpus):
        got = sampling.stratified_sample(corpus, {"en": 1000}, default_mille=0)
        assert got.select("lang").distinct().collect()[0].lang == "en"
        assert got.count() == 100

    def test_deterministic_under_repartition(self, corpus):
        a = sampling.stratified_sample(corpus, {"en": 500, "de": 200}, 100)
        b = sampling.stratified_sample(
            corpus.repartition(7, "lang"), {"en": 500, "de": 200}, 100
        )
        assert a.select("doc_id").subtract(b.select("doc_id")).count() == 0
        assert b.select("doc_id").subtract(a.select("doc_id")).count() == 0

    def test_summary_consistent_with_sample(self, corpus):
        rates = {"en": 500, "de": 200}
        summ = {r.stratum: r for r in sampling.mixture_summary(corpus, rates, 100).collect()}
        samp = (
            sampling.stratified_sample(corpus, rates, 100)
            .groupBy("lang")
            .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        )
        for r in samp.collect():
            assert summ[r.lang].n_sampled == r.n
            assert summ[r.lang].sum_sampled_ids == r.s
        assert {r.stratum: r.target_mille for r in summ.values()} == {
            "en": 500, "de": 200, "fr": 100,
        }


class TestHistogramQuantiles:
    def test_exact_on_uniform_groups(self, spark):
        from ddaugner_spark.operators.sketches import histogram_quantiles

        rows = [(g, float(v)) for g in ("a", "b") for v in range(100)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {r.g: r for r in histogram_quantiles(df, "value", "g").collect()}
        for g in ("a", "b"):
            r = out[g]
            assert r.n == 100
            # 0..99 over 128 bins of width 99/128: estimates are lower
            # edges, within one bin width of the exact quantile
            w = 99.0 / 128
            assert abs(r.q_5 - 49.5) <= w + 0.5
            assert abs(r.q_9 - 89.1) <= w + 0.5
            assert abs(r.q_99 - 98.01) <= w + 0.5

    def test_constant_group_and_nulls(self, spark):
        from ddaugner_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame(
            [("c", 7.0), ("c", 7.0), ("c", None)], "g string, value double"
        )
        r = histogram_quantiles(df, "value", "g").collect()[0]
        assert (r.q_5, r.q_9, r.q_99, r.n) == (7.0, 7.0, 7.0, 2)

    def test_merge_property(self, spark):
        """Bin counts merge by addition: sketching a union == sketching
        the parts (same global bounds)."""
        from ddaugner_spark.operators.sketches import histogram_quantiles

        rows = [("a", float(v)) for v in range(200)]
        full = spark.createDataFrame(rows, "g string, value double")
        halves = spark.createDataFrame(rows[:100], "g string, value double").union(
            spark.createDataFrame(rows[100:], "g string, value double")
        )
        assert (
            histogram_quantiles(full, "value", "g").collect()
            == histogram_quantiles(halves, "value", "g").collect()
        )


class TestFixedSizeSample:
    def test_exactly_k_and_prefix_consistency(self, spark):
        from ddaugner_spark.operators.sampling import fixed_size_sample

        rows = [(i, "t", ["en", "de"][i % 2]) for i in range(400)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = fixed_size_sample(docs, k=10)
        got = out.groupBy("stratum").count().collect()
        assert {r.stratum: r["count"] for r in got} == {"en": 10, "de": 10}
        # two-phase result == the plain global top-k by md5 (prefilter
        # is a prefix of the order, margin not underfilled here)
        import hashlib

        for lang in ("en", "de"):
            ids = [i for i, _, l in rows if l == lang]
            want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
            have = [r.rid for r in out.filter(F.col("stratum") == lang).orderBy("rank").collect()]
            assert have == want

    def test_small_stratum_yields_all(self, spark):
        from ddaugner_spark.operators.sampling import fixed_size_sample

        docs = spark.createDataFrame(
            [(i, "t", "xx") for i in range(3)], "doc_id long, text string, lang string"
        )
        assert fixed_size_sample(docs, k=10).count() == 3


class TestVocab:
    def test_counts_threshold_and_order(self, spark):
        from ddaugner_spark.operators.textstats import vocab_df

        docs = spark.createDataFrame(
            [(1, "b a a c b a"), (2, "b d")], "doc_id long, text string"
        )
        got = [(r.token, r.n, r.token_id) for r in vocab_df(docs, min_count=2).orderBy("token_id").collect()]
        assert got == [("a", 3, 1), ("b", 3, 2)]  # tie → lexicographic

    def test_empty_and_null_text(self, spark):
        from ddaugner_spark.operators.textstats import vocab_df

        docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
        assert vocab_df(docs).count() == 0


class TestTokenBudgetMixture:
    def _run(self, spark, rows, shares, budget):
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        return {
            r.stratum: r.asDict()
            for r in sampling.token_budget_mixture(
                docs, shares, budget, strat_col="source"
            ).collect()
        }

    def test_rates_derive_from_supply(self, spark):
        # src_a supplies 40 tokens, src_b 10; equal shares of a
        # 20-token budget -> rates 250 and 1000 (saturated)
        rows = [(i, "src_a", "t " * 3 + "t") for i in range(10)] + [
            (100 + i, "src_b", "u") for i in range(10)
        ]
        got = self._run(spark, rows, {"src_a": 0.5, "src_b": 0.5}, 20)
        assert got["src_a"]["avail_tokens"] == 40
        assert got["src_a"]["rate_mille"] == 250
        assert got["src_b"]["avail_tokens"] == 10
        assert got["src_b"]["rate_mille"] == 1000  # under-supplied: take all
        assert got["src_b"]["n_kept"] == 10
        assert got["src_b"]["kept_tokens"] == 10

    def test_unlisted_stratum_rate_zero_but_reported(self, spark):
        rows = [(1, "a", "x y"), (2, "b", "z")]
        got = self._run(spark, rows, {"a": 1.0}, 100)
        assert got["b"]["rate_mille"] == 0
        assert got["b"]["n_kept"] == 0
        assert got["b"]["avail_tokens"] == 1

    def test_membership_matches_bucket_rule(self, spark):
        # the kept set must be exactly stratified_sample's md5 rule at
        # the derived rate
        rows = [(i, "s", "w w w w") for i in range(200)]
        got = self._run(spark, rows, {"s": 0.5}, 200)  # 100 of 800 -> rate 125
        assert got["s"]["rate_mille"] == 125
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        expect = (
            docs.filter(sampling.sample_bucket("doc_id") < 125)
            .agg(
                F.count("*").alias("n"), F.sum("doc_id").alias("s")
            )
            .collect()[0]
        )
        assert got["s"]["n_kept"] == expect.n
        assert got["s"]["sum_kept_ids"] == expect.s

    def test_deterministic_under_repartition(self, spark):
        rows = [(i, f"src{i % 3}", "a b c d e") for i in range(90)]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        shares = {"src0": 0.4, "src1": 0.4, "src2": 0.2}
        one = sorted(
            map(tuple, sampling.token_budget_mixture(
                docs.coalesce(1), shares, 100, strat_col="source").collect())
        )
        many = sorted(
            map(tuple, sampling.token_budget_mixture(
                docs.repartition(13), shares, 100, strat_col="source").collect())
        )
        assert one == many


# ---------------------------------------------------------------------------
# Per-source boilerplate removal
# ---------------------------------------------------------------------------


def test_boilerplate_header_stripped_footer_kept(spark, sf_dir):
    """On the chrome-injected corpus the header sits above the 0.5
    document-frequency bar (≈2/3 of each source) and must vanish from
    EVERY carrier; the footer sits below it (≈1/4) and must survive —
    verified against a per-doc python reconstruction of the expected
    clean text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    amp = dedup.with_boilerplate_corpus(docs)
    got = {
        r["doc_id"]: (r["n_sents"], r["n_boiler"], r["clean_hash"])
        for r in dedup.boilerplate_removal(amp, min_frac=0.5, min_docs=2).collect()
    }
    import hashlib
    from collections import defaultdict

    def split_sents(text):
        # terminator ends a sentence and stays attached
        sents, cur = [], []
        for t in text.split(" ") if text else []:
            cur.append(t)
            if t == config.SENT_TERM:
                sents.append(" ".join(cur))
                cur = []
        if cur:
            sents.append(" ".join(cur))
        return sents

    rows = amp.collect()
    # python replica of the rule: per-source document frequency over
    # sentences, bar = max(min_docs, 0.5·|source docs|)
    df, nd = defaultdict(set), defaultdict(int)
    for r in rows:
        nd[r["source"]] += 1
        for s in set(split_sents(r["text"])):
            df[(r["source"], s)].add(r["doc_id"])
    boiler = {
        key for key, owners in df.items()
        if len(owners) >= 2 and len(owners) >= 0.5 * nd[key[0]]
    }
    any_footer_carrier = False
    for r in rows:
        sents = split_sents(r["text"])
        header = f"cookie notice {r['source']} {config.SENT_TERM}"
        footer = f"all rights reserved {r['source']} {config.SENT_TERM}"
        assert (header in sents) == (r["doc_id"] % 3 != 2)
        kept = [s for s in sents if (r["source"], s) not in boiler]
        n_sents, n_boiler, h = got[r["doc_id"]]
        assert n_sents == len(sents)
        assert n_boiler == len(sents) - len(kept)
        if r["doc_id"] % 3 != 2:
            assert header not in kept  # above the bar → stripped
        if footer in sents:
            any_footer_carrier = True
            assert footer in kept  # below the bar → survives
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert h == want, (r["doc_id"], h, want)
    assert any_footer_carrier


def test_boilerplate_min_docs_threshold(spark):
    """A line shared by fewer than min_docs documents is never
    boilerplate, whatever its fraction."""
    t = config.SENT_TERM
    rows = [
        (1, "s", f"shared line {t} unique one {t}"),
        (2, "s", f"shared line {t} unique two {t}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["doc_id"]: r["n_boiler"]
        for r in dedup.boilerplate_removal(docs, min_frac=0.5, min_docs=3).collect()
    }
    assert out == {1: 0, 2: 0}
    out2 = {
        r["doc_id"]: r["n_boiler"]
        for r in dedup.boilerplate_removal(docs, min_frac=0.5, min_docs=2).collect()
    }
    assert out2 == {1: 1, 2: 1}  # df=2, frac=1.0 → stripped from both


# ---------------------------------------------------------------------------
# DSIR importance weighting
# ---------------------------------------------------------------------------


def _dsir_corpus(spark):
    """Target docs (lang=en) speak vocab A, raw docs vocab B; one
    held-out doc per vocabulary gets the score."""
    rows = (
        [(i, "en", "alpha beta gamma delta " * 5) for i in range(10)]
        + [(100 + i, "zh", "omega psi chi phi " * 5) for i in range(10)]
        + [(900, "zh", "alpha beta gamma delta"), (901, "en", "omega psi chi phi")]
    )
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_dsir_separates_target_from_raw(spark):
    """Target-vocabulary docs must score positive, raw-vocabulary docs
    negative — REGARDLESS of their own lang label (the scorer sees only
    token distributions)."""
    from ddaugner_spark.operators.sampling import dsir_weights

    got = {
        r["doc_id"]: (r["logratio"], r["kept"])
        for r in dsir_weights(
            _dsir_corpus(spark), F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    assert got[900][0] > 0 and got[900][1]      # target vocab, raw label
    assert got[901][0] < 0 and not got[901][1]  # raw vocab, target label
    for i in range(10):
        assert got[i][0] > 0 > got[100 + i][0]


def test_dsir_repartition_invariant(spark, sf_dir):
    from ddaugner_spark.operators.sampling import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        tuple(r)
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    b = {
        tuple(r)
        for r in dsir_weights(docs.repartition(16), F.col("lang") == "en").collect()
    }
    assert a == b


def test_dsir_empty_docs_total(spark):
    """NULL/empty text keeps a row: zero tokens, zero score, not kept."""
    from ddaugner_spark.operators.sampling import dsir_weights

    rows = [(1, "en", "alpha beta"), (2, "zh", None), (3, "zh", "")]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    assert got[2] == (0, 0.0, False) and got[3] == (0, 0.0, False)
    assert got[1][0] == 2


# ---------------------------------------------------------------------------
# Cross-document exact-substring duplication (ExactSubstr)
# ---------------------------------------------------------------------------


def _tok_text(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_exact_substr_recovers_exact_length(spark):
    """A verbatim 50-token block shared between otherwise-different docs
    must be reported with longest_match_tokens == 50 exactly."""
    shared = _tok_text("s", 50)
    rows = [
        (1, _tok_text("a", 30) + " " + shared + " " + _tok_text("x", 25)),
        (2, shared + " " + _tok_text("y", 40)),
        (3, _tok_text("z", 60)),  # shares nothing
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.exact_substring_pairs(docs, w=20).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert r["longest_match_tokens"] == 50
    assert r["longest_run"] == 50 - 20 + 1
    assert r["n_shared_windows"] == 31


def test_exact_substr_below_window_is_invisible(spark):
    """A shared run shorter than w produces no matching window."""
    shared = _tok_text("s", 19)
    rows = [
        (1, shared + " " + _tok_text("x", 30)),
        (2, shared + " " + _tok_text("y", 30)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # the shared prefix is 19 tokens; windows starting inside it extend
    # into differing suffixes, so nothing matches
    assert dedup.exact_substring_pairs(docs, w=20).count() == 0


def test_exact_substr_repeated_block_two_diagonals(spark):
    """Doc 2 contains the shared block twice: two diagonals, each with
    the block's run; longest stays the block length, total windows
    doubles."""
    blk = _tok_text("s", 30)
    rows = [
        (1, _tok_text("a", 25) + " " + blk),
        (2, blk + " " + _tok_text("m", 22) + " " + blk),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup.exact_substring_pairs(docs, w=20).collect()[0]
    assert r["longest_match_tokens"] == 30
    assert r["n_shared_windows"] == 2 * (30 - 20 + 1)


def test_exact_substr_on_amplified_corpus(spark, sf_dir):
    """Exact copies report their full token length; tail-truncated near
    copies report length − 3 (when long enough to window)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    amp = dedup.with_dup_corpus(docs)
    lens = {
        r["doc_id"]: r["n"]
        for r in amp.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["longest_match_tokens"]
        for r in dedup.exact_substring_pairs(amp, w=20).collect()
    }
    checked = 0
    for (a, b), L in got.items():
        if b == a + 1_000_000:
            assert L == lens[a], (a, b, L, lens[a])
            checked += 1
        elif b == a + 2_000_000 and lens[a] >= 23:
            assert L == lens[a] - 3, (a, b, L, lens[a])
            checked += 1
    assert checked >= 2


def test_new_ops_plan_shapes(spark, sf_dir):
    """Scale claims pinned in the physical plan: boilerplate's anti
    join and DSIR's rate join come back as broadcasts (the corpus side
    is never shuffled to meet them)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    bp = dedup.boilerplate_removal(dedup.with_boilerplate_corpus(docs))
    plan = bp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    ds = sampling.dsir_weights(docs, F.col("lang") == "en")
    plan = ds._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_inclusion_scales_with_weight(spark):
    """A-ES property: across many disjoint strata (independent draws),
    heavy rows sample far more often than light ones.  doc_ids chosen
    per stratum so the draw u is iid-ish (md5); weight ratio 50:1 on
    2-of-10 rows → heavy rows should dominate the k=2 sample."""
    rows = []
    for s in range(200):
        for j in range(10):
            rows.append((s * 100 + j, f"s{s}", 500 if j < 2 else 10))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = sampling.weighted_sample(docs, "n_chars", k=2, stratum_col="lang")
    heavy = out.filter(F.col("weight") == 500.0).count()
    total = out.count()
    assert total == 400
    # E[heavy among top-2] >> uniform's 0.2·2; demand a clear majority
    assert heavy / total > 0.6, heavy


def test_weighted_sample_deterministic_and_weight_gated(spark):
    rows = [(1, "x", 10), (2, "x", 0), (3, "x", None), (4, "x", 7)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = sampling.weighted_sample(docs, "n_chars", k=10, stratum_col="lang")
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [1, 4]  # weight <= 0 / NULL never samples
    again = sampling.weighted_sample(
        docs.repartition(5), "n_chars", k=10, stratum_col="lang"
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom screening is one-sided: every doc the exact screen flags
    must be flagged by the Bloom screen with at least as many hits."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = dedup.with_dup_corpus(d).filter(F.col("doc_id") >= 1_000_000)
    benchmark = d.select("doc_id", "text").filter(F.col("doc_id") % 20 == 10)
    exact = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in dedup.contaminated_docs(corpus, benchmark, min_shared=2).collect()
    }
    bloom = {
        r["doc_id"]: r["n_maybe_shingles"]
        for r in dedup.bloom_contaminated(corpus, benchmark, min_shared=2)
        .filter("flagged")
        .collect()
    }
    assert exact, "exact screen found nothing — fixture broken"
    for doc, n_exact in exact.items():
        assert doc in bloom and bloom[doc] >= n_exact, (doc, n_exact)


def test_bloom_saturated_filter_flags_everything(spark):
    """Degenerate geometry (tiny m) saturates the bit set: every
    shingled doc maybe-hits — the documented failure mode a production
    config must size m against."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "q r s t u v")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "x y z w k j")], "doc_id long, text string")
    out = dedup.bloom_contaminated(docs, bench, m_bits=2, k_hashes=1, min_shared=1)
    assert out.filter("flagged").count() == 2


class TestNfcNormalized:
    """nfc_normalized (textstats): Unicode TR#15 NFC canonicalization —
    the pass every hash-keyed operator needs before a real crawl."""

    def test_decomposed_composes_composed_unchanged(self, spark):
        composed = "caf\u00e9"            # \u00e9 as one code point
        decomposed = "café"         # e + COMBINING ACUTE ACCENT
        out = {
            r.doc_id: r.text_nfc
            for r in textstats.nfc_normalized(
                _docs(spark, [(1, composed), (2, decomposed), (3, None)])
            ).collect()
        }
        assert out[1] == composed          # already NFC: byte-identical
        assert out[2] == composed          # decomposed → composed
        assert out[3] is None              # null text passes through

    def test_hash_keyed_equality_restored(self, spark):
        """The motivating property: md5 of the two visible-identical
        forms differs raw, matches after NFC."""
        d = _docs(spark, [(1, "Zoë x"), (2, "Zoë x")])
        n = textstats.nfc_normalized(d)
        raw = d.select(F.md5("text").alias("h")).distinct().count()
        nfc = n.select(F.md5("text_nfc").alias("h")).distinct().count()
        assert raw == 2 and nfc == 1

    def test_matches_python_unicodedata_on_corpus_sample(self, spark, sf_dir):
        """Engine output == per-row unicodedata.normalize on real
        corpus text (plus adversarial combining marks)."""
        import unicodedata

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.concat("text", F.lit(" ñ ṩ")).alias("text"))
            .limit(50)
        )
        got = {r.doc_id: r.text_nfc for r in textstats.nfc_normalized(docs).collect()}
        for r in docs.collect():
            assert got[r.doc_id] == unicodedata.normalize("NFC", r.text)


class TestBpePairCounts:
    def test_weighted_by_word_frequency(self, spark):
        from ddaugner_spark.operators.textstats import bpe_pair_counts

        docs = spark.createDataFrame(
            [(1, "ab ab ab cd"), (2, "ab xy")], "doc_id long, text string"
        )
        got = {r.pair: r.n for r in bpe_pair_counts(docs).collect()}
        assert got["ab"] == 4  # 4 instances of word 'ab'
        assert got["cd"] == 1 and got["xy"] == 1

    def test_overlapping_pairs_within_word(self, spark):
        from ddaugner_spark.operators.textstats import bpe_pair_counts

        docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
        got = {r.pair: r.n for r in bpe_pair_counts(docs).collect()}
        assert got == {"aa": 2}  # positions 1-2 and 2-3

    def test_single_char_words_and_rank_order(self, spark):
        from ddaugner_spark.operators.textstats import bpe_pair_counts

        docs = spark.createDataFrame(
            [(1, "a b c zz zz yy")], "doc_id long, text string"
        )
        rows = bpe_pair_counts(docs).collect()
        assert [(r.pair, r.n, r.rank) for r in rows] == [("zz", 2, 1), ("yy", 1, 2)]


class TestPerplexityBuckets:
    def test_tercile_sizes_and_ordering(self, spark):
        from ddaugner_spark.operators.textstats import perplexity_buckets

        # 9 docs, one language: repetitive docs score lower nll
        rows = [(i, "en", ("the cat " * (20 - i) + f"u{i} v{i} w{i}").strip())
                for i in range(9)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = perplexity_buckets(docs).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, []).append(r.nll)
        assert {len(v) for v in by_bucket.values()} == {3}
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])

    def test_languages_bucketed_independently(self, spark):
        from ddaugner_spark.operators.textstats import perplexity_buckets

        rows = [(i, "en" if i < 6 else "fr", f"a b c d{i} e{i}") for i in range(12)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = perplexity_buckets(docs).collect()
        for lang in ("en", "fr"):
            assert sorted(r.bucket for r in out if r.lang == lang) == \
                ["head", "head", "middle", "middle", "tail", "tail"]


class TestUrlTemplates:
    def test_generalization_rules(self, spark):
        from ddaugner_spark.operators import crawl

        urls = spark.createDataFrame(
            [
                ("https://a.com/doc/123",),
                ("https://a.com/doc/999",),
                ("https://a.com/u/deadbeef0123",),
                ("https://a.com/u/cafebabe4567",),
                ("https://a.com/about",),
                ("https://b.com/about",),
            ],
            "url string",
        )
        got = {
            (r.host, r.template): r.n_urls
            for r in crawl.url_templates(urls, min_count=2).collect()
        }
        # hex rule fires before digit rule; singletons dropped
        assert got == {
            ("a.com", "/doc/{n}"): 2,
            ("a.com", "/u/{hex}"): 2,
        }


def test_gopher_rules_each_rule_fails_independently(spark):
    """One synthetic doc per rule violation; a canonical good doc
    passes everything.  All thresholds are integer comparisons."""
    good_words = ("the be to of and that have with word " * 8).strip()
    line = "the be to of and that have with word wind park"
    ell_doc = "\n".join(
        [line + "..." for _ in range(4)] + [line for _ in range(6)]
    )
    rows = [
        (1, good_words),                                   # passes all
        (2, "the be short"),                               # too few words
        (3, " ".join(["abcdefghijklmnop"] * 60) + " the be"),  # mean len > 10
        (4, " ".join(["c#####"] * 3) + " " + good_words),  # symbol ratio
        (5, "- the be\n- to of\n- and that\n- have with"),  # all bullets
        (6, ell_doc),                                      # ellipsis line ends
        (7, " ".join(["12345"] * 80) + " the be"),         # non-alpha words
        (8, ("zig zag " * 40).strip()),                    # no stop words
    ]
    out = {r["doc_id"]: r for r in
           textstats.gopher_rules(_docs(spark, rows), min_words=5).collect()}
    assert out[1]["keep"] and all(
        out[1][c] for c in out[1].asDict() if c.startswith("ok_")
    )
    assert not out[2]["ok_words"] and not out[2]["keep"]
    assert not out[3]["ok_mean_len"] and not out[3]["keep"]
    assert not out[4]["ok_symbols"] and not out[4]["keep"]
    assert not out[5]["ok_bullets"] and not out[5]["keep"]
    assert not out[6]["ok_ellipsis"] and not out[6]["keep"]
    assert not out[7]["ok_alpha"] and not out[7]["keep"]
    assert not out[8]["ok_stops"] and not out[8]["keep"]
    # the failed rule is the ONLY failed rule for docs 4-8
    for d, rule in [(4, "ok_symbols"), (5, "ok_bullets"),
                    (6, "ok_ellipsis"), (7, "ok_alpha"), (8, "ok_stops")]:
        fails = [c for c in out[d].asDict()
                 if c.startswith("ok_") and not out[d][c]]
        assert fails == [rule], (d, fails)


def test_c4_line_clean_rules(spark):
    """Line gates: terminal punctuation, min words, javascript; doc
    gates: lorem ipsum, brace, min kept lines."""
    keepable = 'alpha beta gamma delta epsilon.'
    rows = [
        # 3 good lines -> kept, doc survives
        (1, "\n".join([keepable] * 3)),
        # good lines but one has javascript -> 2 kept -> doc dropped
        (2, "\n".join([keepable, "run JavaScript now quickly please.",
                       keepable])),
        # no terminal punctuation -> nothing kept
        (3, "alpha beta gamma delta epsilon"),
        # short line (4 words) dropped even with punctuation
        (4, "\n".join([keepable] * 3 + ["alpha beta gamma delta."])),
        # lorem ipsum kills the doc even with 3 good lines
        (5, "\n".join([keepable] * 3 + ["Lorem Ipsum dolor sit amet."])),
        # brace kills the doc
        (6, "\n".join([keepable] * 3 + ["var x = {a} b c d e."])),
    ]
    out = {r["doc_id"]: r for r in
           textstats.c4_line_clean(_docs(spark, rows)).collect()}
    assert out[1]["n_kept"] == 3 and not out[1]["doc_dropped"]
    assert out[1]["kept_text"] == "\n".join([keepable] * 3)
    assert out[2]["n_kept"] == 2 and out[2]["doc_dropped"]
    assert out[3]["n_kept"] == 0 and out[3]["doc_dropped"]
    assert out[4]["n_kept"] == 3  # the 4-word line is filtered
    assert out[5]["n_kept"] == 4 and out[5]["doc_dropped"]
    assert out[6]["doc_dropped"]
