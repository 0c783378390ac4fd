"""Deterministic stratified sampling — training-data mixture
construction over a document corpus.

Not in the reference (its corpora are hand-assembled file lists); this
is the standard "mixture weights" stage of a web-scale pretraining
pipeline: each stratum (language, source domain, quality band …) is
downsampled to a target rate, deterministically, so the same corpus
always yields the same mixture regardless of partitioning, resume, or
cluster size (CLAUDE.md determinism rule: every random choice is a pure
function of row identity).

The sampling key is md5 of the row id — uniform, engine-exact on the
DuckDB oracle side via the established ``F.conv(hex,16,10)`` ↔
``('0x'||hex)::UBIGINT`` pairing.  A row is sampled iff its bucket
(0..999) falls below the stratum's per-mille rate, so rates are exact
to 1/1000 in expectation and reproducible row-by-row.

Shape at scale: the filter is a narrow map over the scan (predicate
pushdown keeps untouched columns pruned); no shuffle until the caller
aggregates.  The per-mille threshold is a literal CASE over the stratum
column — no join against a rate table needed below ~thousands of
strata (broadcast-join a rate dimension beyond that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def holdout_split(id_col: str = "doc_id", train_pct: int = 80) -> Column:
    """'train'/'eval' split column from the row's identity (md5 leading
    16 bits mod 100) — deterministic, repartition/resume-stable, and
    independent of any near-dup structure, which is exactly why the
    split-leakage audit (q_split_leakage) is needed on top of it."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval"))


def sample_bucket(id_col: str = "doc_id") -> Column:
    """Deterministic bucket 0..999 from md5 of the row id (first 4 hex
    digits → 0..65535, mod 1000; the ~6.5% modulo bias across buckets is
    irrelevant at per-mille granularity and documented here)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 1000
    )


def stratified_sample(
    docs: DataFrame,
    rates_mille: dict[str, int],
    default_mille: int = 0,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``docs`` whose bucket falls under their stratum's
    per-mille rate.  ``rates_mille`` maps stratum value → kept rows per
    1000 (e.g. ``{"en": 600, "de": 300}``); unlisted strata use
    ``default_mille`` (0 = dropped)."""
    rate = F.lit(default_mille)
    for k in sorted(rates_mille, reverse=True):
        rate = F.when(F.col(strat_col) == k, F.lit(rates_mille[k])).otherwise(rate)
    return docs.filter(sample_bucket(id_col) < rate)


def mixture_summary(
    docs: DataFrame,
    rates_mille: dict[str, int],
    default_mille: int = 0,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(stratum, n_docs, n_sampled, sum_sampled_ids, target_mille) — the
    realized mixture next to its target.  ``sum_sampled_ids`` makes the
    row membership-sensitive: any divergence in WHICH rows were kept
    (not just how many) breaks the hash match against the oracle."""
    sampled = F.col("bucket") < F.col("target_mille")
    rate = F.lit(default_mille)
    for k in sorted(rates_mille, reverse=True):
        rate = F.when(F.col(strat_col) == k, F.lit(rates_mille[k])).otherwise(rate)
    with_key = docs.select(
        F.col(strat_col).alias("stratum"),
        F.col(id_col).alias("rid"),
        sample_bucket(id_col).alias("bucket"),
        rate.alias("target_mille"),
    )
    return (
        with_key.groupBy("stratum", "target_mille")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sampled.cast("long")).alias("n_sampled"),
            F.sum(F.when(sampled, F.col("rid")).otherwise(F.lit(0)))
            .cast("long")
            .alias("sum_sampled_ids"),
        )
        .select(
            "stratum",
            "n_docs",
            "n_sampled",
            "sum_sampled_ids",
            F.col("target_mille").cast("long").alias("target_mille"),
        )
    )


def fixed_size_sample(
    docs: DataFrame,
    k: int,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    safety: int = 4,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (eval-set
    construction): the k rows with the smallest md5 sampling keys in
    each stratum, rank attached — (stratum, rid, rank), rank 1..k.

    Two-phase so no stratum ever sorts at corpus scale: per-stratum
    counts (map-side-combined agg, broadcast back) set a threshold on
    the key's LEADING 16 BITS targeting ~``safety``·k expected
    survivors; because the filter keys on a PREFIX of the sort order,
    the true top-k are all survivors whenever ≥ k rows pass, and the
    row_number window sorts only those ~safety·k survivors per stratum,
    not the stratum.  Strata with ≤ safety·k rows skip the prefilter
    (threshold 65536).  The prefilter is part of the operator's SPEC —
    the oracle computes the same threshold, so results match even in
    the (astronomically unlikely, uniform md5) case of the margin
    under-filling a stratum.  Strata smaller than k yield all their
    rows.
    """
    from pyspark.sql import Window

    key = F.md5(F.col(id_col).cast("string"))
    counts = docs.groupBy(strat_col).agg(F.count("*").alias("n_stratum"))
    thresh = F.least(
        F.lit(65536),
        F.ceil(F.lit(65536.0 * safety * k) / F.col("n_stratum")).cast("long"),
    )
    lead16 = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    survivors = docs.join(F.broadcast(counts), strat_col).filter(lead16 < thresh)
    w = Window.partitionBy(strat_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(strat_col).alias("stratum"),
            F.col(id_col).alias("rid"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def token_budget_mixture(
    docs: DataFrame,
    shares: dict[str, float],
    budget_tokens: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(stratum, avail_tokens, target_tokens, rate_mille, n_kept,
    kept_tokens, sum_kept_ids) — training-mixture construction against a
    TOKEN budget: each stratum's keep rate is derived from its actual
    token supply so the sampled mixture lands on ``shares`` of
    ``budget_tokens`` (rate = min(1, share·budget / supply), quantized
    to per-mille and applied with the same md5 bucket rule as
    stratified_sample — deterministic row membership under
    repartition/resume).  Strata absent from ``shares`` get rate 0 but
    still emit a summary row, so the output pins the full composition.

    This is the budget-closing step the share-only form can't do: with
    fixed per-stratum rates the realized token mix drifts with supply;
    here under-supplied strata saturate at rate 1000 (take everything —
    the under-fill is visible as kept_tokens ≪ target_tokens) and
    over-supplied strata thin to the budget.

    Scale shape: one map-only pass computes per-doc whitespace token
    counts and the sampling bucket; per-stratum supply is a
    map-side-combined aggregate over stratum-count-sized partials; the
    rate is a literal CASE (the numerator share·budget·1000 is
    precomputed driver-side, so both engines divide the same double);
    the final summary re-aggregates the same doc-level rows — no second
    corpus scan, no join.  ``sum_kept_ids`` makes the differential
    membership-sensitive, not just count-sensitive.
    """
    numer = {k: 1000.0 * budget_tokens * v for k, v in shares.items()}
    n_tok = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "), lambda t: t != ""
        )
    ).cast("long")
    base = docs.select(
        F.col(strat_col).alias("stratum"),
        F.col(id_col).alias("rid"),
        n_tok.alias("n_tok"),
        sample_bucket(id_col).alias("bucket"),
    )
    supply = base.groupBy("stratum").agg(F.sum("n_tok").alias("avail_tokens"))
    num_expr = F.lit(0.0)
    tgt_expr = F.lit(0.0)
    for k in sorted(numer, reverse=True):
        num_expr = F.when(F.col("stratum") == k, F.lit(numer[k])).otherwise(num_expr)
        tgt_expr = F.when(
            F.col("stratum") == k, F.lit(float(budget_tokens) * shares[k])
        ).otherwise(tgt_expr)
    rated = base.join(F.broadcast(supply), "stratum").withColumn(
        "rate_mille",
        F.least(
            F.lit(1000), F.floor(num_expr / F.col("avail_tokens")).cast("long")
        ),
    )
    kept = F.col("bucket") < F.col("rate_mille")
    return (
        rated.groupBy("stratum")
        .agg(
            F.min("avail_tokens").alias("avail_tokens"),
            F.round(F.min(tgt_expr), 2).alias("target_tokens"),
            F.min("rate_mille").alias("rate_mille"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
            F.sum(F.when(kept, F.col("rid")).otherwise(F.lit(0)))
            .cast("long")
            .alias("sum_kept_ids"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target_filter: Column,
    n_buckets: int = 256,
    ndigits: int = 4,
) -> DataFrame:
    """(doc_id, n_tokens, logratio, kept) — DSIR-style data selection
    via importance resampling (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio between a TARGET distribution (the rows
    matching ``target_filter`` — a quality subset, a domain, a
    language) and the RAW corpus distribution, both estimated over
    HASHED unigram features so the model is a fixed ``n_buckets``-cell
    table, not a vocabulary.

    weight(d) = Σ_h n_dh · ln(p_T[h] / p_R[h]),  p_•[h] Laplace-smoothed
    bucket unigram probabilities; ``kept`` = logratio > 0 (more
    target-like than raw — the resampling acceptance core; callers
    wanting a fixed budget compose with fixed_size_sample / the
    token-budget mixture above).

    Shape at scale: ONE token-level pass — the explode reduces straight
    into per-(doc_id, bucket) counts via a hash-agg on slim keys with
    map-side combine (per-doc fan-out ≤ min(n_tokens, n_buckets) rows);
    the bucket model (raw + target counts, ``n_buckets`` rows) and the
    corpus totals (1 row) re-aggregate from THAT table, never rescanning
    tokens, and come back as broadcasts — scoring is a map-side join
    plus one final doc_id-keyed aggregate.  No driver-side action.  md5
    bucketing keeps the features engine-exact; only the final ln/round
    is float (the same round-then-compare contract as the PMI /
    bigram-LM oracles).
    """
    from .sketches import cm_bucket

    toks = (
        docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .select(
            "doc_id",
            target_filter.alias("is_target"),
            F.explode(F.split(F.col("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "is_target",
            cm_bucket(F.col("token"), F.lit(0), n_buckets).alias("h"),
        )
    )
    per_doc = toks.groupBy("doc_id", "h").agg(
        F.count("*").alias("n_dh"), F.first("is_target").alias("is_target")
    )
    buckets = per_doc.groupBy("h").agg(
        F.sum("n_dh").alias("c_r"),
        F.sum(F.when(F.col("is_target"), F.col("n_dh")).otherwise(0)).alias("c_t"),
    )
    totals = buckets.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    rates = buckets.crossJoin(F.broadcast(totals)).select(
        "h",
        F.log(
            ((F.col("c_t") + 1.0) / (F.col("n_t") + F.lit(float(n_buckets))))
            / ((F.col("c_r") + 1.0) / (F.col("n_r") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )
    scored = per_doc.join(F.broadcast(rates), "h").groupBy("doc_id").agg(
        F.sum("n_dh").cast("long").alias("n_tokens"),
        F.round(F.sum(F.col("n_dh") * F.col("lr")), ndigits).alias("logratio"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logratio", F.lit(0.0)).alias("logratio"),
            (F.coalesce("logratio", F.lit(0.0)) > 0).alias("kept"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    ndigits: int = 9,
) -> DataFrame:
    """(stratum, doc_id, weight, key, rank) — deterministic
    weight-proportional sampling WITHOUT replacement: the top-``k``
    rows per stratum by the Efraimidis–Spirakis key u^(1/w), where u is
    the md5-uniform draw of the row id.  P(row in sample) rises with
    its weight exactly as A-ES reservoir sampling prescribes, and the
    choice is a pure function of row identity (CLAUDE.md determinism
    rule) — repartition/resume safe, no reservoir state.

    This is the quality/length-weighted cousin of fixed_size_sample
    above (uniform) and the per-mille stratified_sample (rate-based):
    the standard "sample proportional to quality score" stage of a
    pretraining mixture.

    Keys are rounded to ``ndigits`` before ranking with a doc_id
    tie-break — the same rounded-score-ranking device as
    retrieval.tfidf_top_terms, so the cross-engine oracle ranks
    identical numbers.  Rows with weight ≤ 0 or NULL never sample.

    Shape at scale: the key is map-side column arithmetic; top-k per
    stratum is one rank window over the stratum key (strata ≪ corpus;
    for a single global stratum switch to the TakeOrdered form bm25
    uses).  No driver state, no collect.
    """
    from pyspark.sql import Window

    # u in (0, 1]: 12-hex md5 prefix scaled by 16^12 (0 maps to 1/2^48
    # via the +1 below, keeping u strictly positive)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(float(16**12))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, 1.0 / w), ndigits)
    keyed = docs.filter(w > 0).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        key.alias("key"),
    )
    rk = Window.partitionBy("stratum").orderBy(F.desc("key"), "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rendezvous_assign(
    df: DataFrame, key_col: str, n_shards: int = 8
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing (Thaler & Ravishankar
    1998): shard(key) = argmax_s md5(key|s) over ``n_shards`` — the
    assignment under which adding/removing a shard moves ONLY the keys
    whose argmax changes (1/n of them in expectation), unlike mod-N
    where nearly everything moves.  The resharding primitive for a
    100 TB corpus: deterministic, coordination-free, computable
    map-side from the key alone.

    Entirely narrow: each row evaluates n_shards md5 draws into an
    array of (hash, shard) structs and takes array_max (lexicographic,
    so hash decides and the shard index breaks the measure-zero tie) —
    no shuffle, no dimension table, whole-stage codegen end to end.
    """
    elems = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col(key_col).cast("string"), F.lit(str(s))
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(n_shards)
    ]
    return df.select(
        key_col,
        F.array_max(F.array(*elems))["s"].cast("int").alias("shard"),
    )


def horvitz_thompson(
    docs: DataFrame,
    rates_mille: dict[str, int],
    default_mille: int = 0,
    strat_col: str = "source",
    id_col: str = "doc_id",
    ndigits: int = 6,
) -> DataFrame:
    """Horvitz–Thompson (1952) estimation of per-stratum token totals
    from the deterministic md5-bucket Bernoulli sample — the
    design-based answer to "how big is the corpus we sampled from",
    the audit that keeps downsampled mixture pipelines honest: the
    estimate must cover the true total it was thinned from.

    Inclusion probability π_h = rate_mille/1000 is EXACT by
    construction (the sampler keeps buckets < rate of 1000), so
    the estimator total̂ = Σ_sampled x_i/π_h and the Bernoulli-design
    variance estimate var̂ = Σ_sampled x_i²·(1−π_h)/π_h² are integer
    aggregates divided by literal rationals — one division per output
    number, engine/oracle bit-identical.  (x_i² ≤ (10⁵)² per doc and
    Σ fits int64 to ~10⁸ docs per stratum; beyond that switch the
    numerators to DECIMAL(38).)

    Scale shape: sampled rows only (map-only membership predicate →
    one stratum-keyed aggregate); the true totals for the coverage
    readout come from one more aggregate over the full table.

    Output: ``(stratum, pi_mille, n_sampled, est_tokens, true_tokens,
    var_est, rel_err)``.
    """
    ntok = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).cast(
        "long"
    )
    base = docs.select(
        F.col(strat_col).alias("stratum"),
        F.col(id_col).alias("id"),
        ntok.alias("x"),
    )
    rate = F.lit(default_mille)
    for s, m in sorted(rates_mille.items()):
        rate = F.when(F.col("stratum") == s, F.lit(m)).otherwise(rate)
    tagged = base.select(
        "stratum",
        "x",
        rate.cast("long").alias("pi_mille"),
        sample_bucket("id").alias("bucket"),
    )
    sampled = tagged.filter(F.col("bucket") < F.col("pi_mille"))
    est = sampled.groupBy("stratum", "pi_mille").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    truth = base.groupBy("stratum").agg(
        F.sum("x").cast("long").alias("true_tokens")
    )
    pi = F.col("pi_mille") / F.lit(1000.0)
    est_tokens = F.col("sx") / pi
    return (
        est.join(truth, "stratum")
        .select(
            "stratum",
            "pi_mille",
            "n_sampled",
            F.round(est_tokens, ndigits).alias("est_tokens"),
            "true_tokens",
            F.round(
                F.col("sxx") * (1.0 - pi) / (pi * pi), ndigits
            ).alias("var_est"),
            F.round(
                (est_tokens - F.col("true_tokens")) / F.col("true_tokens"),
                ndigits,
            ).alias("rel_err"),
        )
    )
