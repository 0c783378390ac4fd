"""PII redaction over the document corpus: detect and mask emails, IPv4
addresses, international phone numbers, and long ID-like digit runs.

Training-data-pipeline operator (engine addition; web crawls are
scrubbed before model training).  Pure column expressions — a fixed
chain of ``regexp_replace`` / ``regexp_extract_all`` calls, entirely
map-only: no shuffle, no UDF, whole-stage codegen end to end, and the
filter/projection still push down to the parquet scan.

The patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no lookaround, no backrefs — character classes,
bounded repetition, and ASCII word boundaries only, so both engines
match identical spans.  Replacement ORDER is part of the contract:
emails first (their local part may contain digits), then dotted IPv4
(before the bare-digit-run rule can eat an octet sequence), then phone
numbers, then bare ID runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pattern, placeholder — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phones", r"\+\d{10,15}", "[PHONE]"),
    ("ids", r"\b\d{9,}\b", "[ID]"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_ids, clean_text) — per-doc
    PII category counts plus the masked text.  Counts are taken on the
    progressively-redacted string, so a span consumed by an earlier rule
    is not double-counted by a later one (an IPv4 inside an email's
    domain counts once, as the email)."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out_cols = [F.col("doc_id")]
    for name, pat, placeholder in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, placeholder)
    out_cols.append(cur.alias("clean_text"))
    return docs.select(*out_cols)


def k_anonymity_ladder(docs: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity screen with a minimal-generalization ladder over the
    quasi-identifier triple (lang, source, length-decile) — the release
    check a privacy pass runs before publishing per-group statistics of
    a crawl (Sweeney 2002; groups smaller than k re-identify their
    members).

    For every observed level-0 combination the ladder reports the
    FIRST generalization at which its group reaches size ≥ k:
    level 0 = (lang, source, len_decile), level 1 drops the decile,
    level 2 keeps only lang, level 3 = suppress (never reaches k).
    Returns (lang, source, len_decile, n0, level, anon_n) where
    ``anon_n`` is the group size at the chosen level (−1 when
    suppressed — NULL would come back NaN through DuckDB's pandas
    bridge and break type-tagged parity).

    Scale: ONE shuffle — the level-0 aggregate; levels 1/2 are
    re-aggregations of that (tiny) table, broadcast back onto it.  The
    decile is fixed-width arithmetic (least(9, n_chars div 100)), not a
    quantile pass."""
    dec = F.least(F.lit(9), F.floor(F.col("n_chars") / 100)).cast("long")
    g0 = (
        docs.select("lang", "source", dec.alias("len_decile"))
        .groupBy("lang", "source", "len_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n0"))
    )
    g1 = g0.groupBy("lang", "source").agg(F.sum("n0").cast("long").alias("n1"))
    g2 = g1.groupBy("lang").agg(F.sum("n1").cast("long").alias("n2"))
    lvl = (
        F.when(F.col("n0") >= k, F.lit(0))
        .when(F.col("n1") >= k, F.lit(1))
        .when(F.col("n2") >= k, F.lit(2))
        .otherwise(F.lit(3))
    )
    anon = (
        F.when(F.col("n0") >= k, F.col("n0"))
        .when(F.col("n1") >= k, F.col("n1"))
        .when(F.col("n2") >= k, F.col("n2"))
        .otherwise(F.lit(-1))
    )
    return (
        g0.join(F.broadcast(g1), ["lang", "source"])
        .join(F.broadcast(g2), "lang")
        .select(
            "lang",
            "source",
            "len_decile",
            "n0",
            lvl.cast("long").alias("level"),
            anon.cast("long").alias("anon_n"),
        )
    )


def t_closeness(
    events: DataFrame, t: float = 0.2, n_buckets: int = 10, ndigits: int = 6
) -> DataFrame:
    """(event_type, n, emd, t_close) — t-closeness audit (Li, Li &
    Venkatasubramanian 2007, the step past [[l-diversity]]): a
    quasi-identifier class leaks the *distribution* of an ordered
    sensitive attribute when its in-class distribution strays from the
    table-wide one.  QI class = event_type; sensitive attribute = the
    event value, fixed-width-bucketed into ``n_buckets`` ordered bins
    (least(n-1, value div 5) — arithmetic, no quantile pass).  For an
    ordered attribute the Earth-Mover distance has the closed form
    EMD(P,Q) = Σᵢ |cumᵢ(P) − cumᵢ(Q)| / (n_buckets − 1); a class is
    t-close when the ROUNDED emd ≤ t (rounding before the comparison so
    an engine ulp cannot flip the boolean).

    Scale shape: ONE corpus shuffle — the (event_type, bucket) hash
    aggregate with map-side combine.  The bucket spine (classes ×
    n_buckets), the global marginal, and the cumulative window all run
    on that class-count table (|types| × n_buckets rows); the window
    partitions by event_type, so no single-partition sort ever sees
    more than n_buckets rows per class.
    """
    from pyspark.sql import Window

    # floor (not cast) — DuckDB's double→BIGINT cast rounds-to-nearest
    # while Spark's truncates; floor() agrees on both engines.
    # greatest(0, …) clamps negative values into the bottom bucket the
    # way least clamps the top — without it a negative-valued row falls
    # outside the spine and silently vanishes from both distributions
    b = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(n_buckets - 1).cast("long"), F.floor(F.col("value") / 5)),
    )
    cl = (
        events.select("event_type", b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = (
        cl.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long")
                )
            ).alias("bucket"),
        )
    )
    filled = spine.join(cl, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    tot = filled.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    glob = filled.groupBy("bucket").agg(F.sum("c").cast("long").alias("g"))
    gn = glob.agg(F.sum("g").cast("long").alias("gN"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = (
        filled.join(F.broadcast(glob), "bucket")
        .join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(gn))
        .select(
            "event_type",
            "n",
            (
                F.sum("c").over(w).cast("double") / F.col("n")
                - F.sum("g").over(w).cast("double") / F.col("gN")
            ).alias("cum_diff"),
        )
    )
    emd = F.round(F.sum(F.abs(F.col("cum_diff"))) / (n_buckets - 1), ndigits)
    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        emd.alias("emd"),
        (emd <= t).alias("t_close"),
    )


def l_diversity(docs: DataFrame, l_req: int = 3) -> DataFrame:
    """(source, len_decile, n, l_distinct, top_sensitive, top_n,
    diverse) — l-diversity audit of the quasi-identifier classes the
    k-anonymity ladder uses (source × length decile), sensitive
    attribute = lang: a class is safe only if ≥ ``l_req`` DISTINCT
    sensitive values appear (k-anonymity alone lets a homogeneous class
    leak the attribute — Machanavajjhala et al. 2007).  ``top_*`` report
    the dominant sensitive value (argmax packed into the aggregate,
    ties → lexicographically smaller lang).

    Two hash aggregates (per (class, lang) counts, then per class) —
    the same re-aggregation shape as the ladder; exact integers only.
    """
    dec = F.least(F.lit(9), F.expr("n_chars DIV 100")).cast("long")
    cl = (
        docs.select(
            "source", dec.alias("len_decile"),
            F.coalesce("lang", F.lit("")).alias("lang"),
        )
        .groupBy("source", "len_decile", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("nl"))
    )
    key = F.concat(
        F.lpad((F.lit(10**12) - F.col("nl")).cast("string"), 13, "0"),
        F.col("lang"),
    )
    return cl.groupBy("source", "len_decile").agg(
        F.sum("nl").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.substring(F.min(key), 14, 32).alias("top_sensitive"),
        (F.lit(10**12) - F.substring(F.min(key), 1, 13).cast("long"))
        .cast("long")
        .alias("top_n"),
        (F.count(F.lit(1)) >= l_req).alias("diverse"),
    )


def dp_histogram(
    df: DataFrame,
    group: str,
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """ε-DP histogram release with DETERMINISTIC pseudo-noise:
    ``(group, n, noise, released)`` — per-group counts plus
    Laplace(1/ε) noise drawn by inverse CDF from the md5(salt|group)
    uniform, released as ``max(0, n + round(noise))``.  The Laplace
    mechanism's arithmetic and post-processing exactly as a DP release
    pipeline runs it; the DRAW is a pure function of the group key (the
    house determinism contract — results survive repartition/resume and
    replay in SQL).  A production release swaps the md5 uniform for a
    calibrated RNG; everything else is unchanged.

    Count sensitivity is 1, so scale b = 1/ε.  noise =
    −b·sign(u−½)·ln(1−2|u−½|), rounded to 6 before the integer
    post-processing so both engines release the identical integer
    (ln is the one libm call — the naive_bayes round-before-compare
    idiom).  One group-sized aggregate; the noise is map-only on the
    group-count table.
    """
    counts = df.groupBy(F.col(group).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col("grp"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**12))
    )
    b = 1.0 / float(epsilon)
    # clamp u away from exact 0 (an all-zero md5 prefix would put
    # 1-2|u-1/2| at 0 and the ln at -inf); same clamp in the SQL twin
    u = F.greatest(u, F.lit(2.0**-48))
    half = u - F.lit(0.5)
    noise = F.round(
        -F.lit(b)
        * F.signum(half)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(half)),
        6,
    )
    return counts.select(
        F.col("grp").alias(group),
        "n",
        noise.alias("noise"),
        F.greatest(F.lit(0), F.col("n") + F.round(noise).cast("long"))
        .cast("long")
        .alias("released"),
    )


def randomized_response(
    events: DataFrame, p_num: int = 3, p_den: int = 4, ndigits: int = 6
) -> DataFrame:
    """LOCAL-DP frequency estimation by randomized response (Warner
    1965; the k-ary generalized RR of RAPPOR-style telemetry) — the
    local-model counterpart to :func:`dp_histogram`'s central release:
    each row reports its TRUE event_type with probability
    ``p = p_num/p_den`` and otherwise a uniformly drawn other type;
    the collector sees only the noisy stream and de-biases per type
    with the unbiased estimator

        n̂_t = (r_t − n·q) / (p − q),   q = (1 − p) / (k − 1)

    Output per type: ``(event_type, n_true, n_reported, n_est)`` —
    ground truth (for the gate's error readout), the noisy count, and
    the rounded estimate.

    House determinism contract: both "coins" are pure functions of
    row identity — report-truth iff md5(event_id) mod p_den < p_num,
    and the lie is the md5(event_id|lie)-th OTHER type in the sorted
    type vocabulary — so the mechanism replays bit-identically in SQL
    and survives repartition (a production deployment swaps the md5
    draws for client RNGs; the estimator and plan are unchanged).

    De-bias arithmetic is EXACT integers scaled by (k−1)·p_den:
    n̂_t = ((k−1)·p_den·r_t − n·(p_den−p_num)) / ((k−1)·p_num −
    (p_den−p_num)) — one division per type, no float chain.

    Scale shape: the type vocabulary is a sorted broadcast dimension;
    the perturbation is map-only on the event stream; two type-sized
    aggregates (true and reported counts) joined on the tiny key.
    """
    from pyspark.sql import Window

    types = (
        events.select("event_type")
        .distinct()
        .withColumn(
            "tidx",
            F.row_number().over(Window.orderBy("event_type")) - 1,
        )
    )
    k_df = types.agg(F.count(F.lit(1)).cast("long").alias("k"))
    e = (
        events.select("event_id", "event_type")
        .join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(k_df))
    )
    coin = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % p_den
    )
    lie_draw = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("event_id").cast("string"), F.lit("lie"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("k") - 1)
    )
    # the lie is the draw-th type in sorted order, skipping the truth
    lie_idx = F.when(lie_draw >= F.col("tidx"), lie_draw + 1).otherwise(lie_draw)
    reported_idx = F.when(coin < p_num, F.col("tidx")).otherwise(lie_idx)
    rep = (
        e.select(reported_idx.alias("tidx"))
        .groupBy("tidx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reported"))
        .join(F.broadcast(types), "tidx")
    )
    true_counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    tot = events.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    j = (
        rep.join(true_counts, "event_type")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(k_df))
    )
    q_den = p_den - p_num
    est = (
        ((F.col("k") - 1) * p_den * F.col("n_reported") - F.col("n_total") * q_den)
        .cast("double")
        / ((F.col("k") - 1) * p_num - q_den)
    )
    return j.select(
        "event_type",
        "n_true",
        "n_reported",
        F.round(est, ndigits).alias("n_est"),
    )
