"""Behavioral analytics over the event stream: ordered funnels, cohort
retention, and event-transition (Markov) matrices.

The reference engine's event surface stops at windowed counts and
sessionization; a crawl/product telemetry pipeline at warehouse scale
additionally asks the three classic sequence questions — how far do
users get through an ordered goal sequence (funnel), do they come back
(retention), and what do they do next (transition matrix).  All three
are expressed as plain DataFrame aggregates so Catalyst keeps every
stage whole-stage-codegen'd and map-side-combinable.

Scale notes:

* **Funnel** uses one slim per-user aggregate per stage, each keyed on
  ``user_id`` — the SAME shuffle key every stage, so the exchange is
  planned once and reused (AQE); the moving tables after stage 1 are
  user-sized, not event-sized.  The sequential-min semantics (stage k's
  timestamp must strictly follow stage k-1's reached time) is the
  correct ordered-funnel definition — min-per-stage-then-compare
  undercounts reorderings.
* **Retention** reduces events to distinct (user, week) once, joins the
  user-sized cohort table, and aggregates — no window over the event
  table.
* **Transitions** need the per-user total order, so ONE window
  (partitioned by user, ordered by (ts, event_id) — the q_events_sessions
  tie-break) computes lead(); everything after is count aggregates, with
  row totals RE-AGGREGATED from the pair counts (shuffle reuse), never
  recounted from events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def funnel_counts(events: DataFrame, stages: list[str] | None = None) -> DataFrame:
    """(stage_idx, stage, n_users): users whose events reach each prefix
    of ``stages`` in strict timestamp order (ties broken by event_id —
    a later stage must have a strictly later (ts, event_id) key than
    the time stage k-1 was reached).

    Stage 1 reached-time = min event key of stage-1 events; stage k
    reached-time = min key of stage-k events strictly after stage k-1's
    reached time.  Comparing on the composite (ts, event_id) key makes
    the funnel deterministic under equal timestamps.
    """
    stages = FUNNEL_STAGES if stages is None else stages
    # composite orderable key as a FIXED-WIDTH packed string (the
    # q_winnow device): lexicographic order == (epoch_us, event_id)
    # numeric order, and plain min()/> work identically in both engines
    # (a long of micros·2^20 + id would overflow; struct-min has no
    # clean DuckDB twin)
    key = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"
        ),
        F.lit("#"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    ).alias("k")

    ev = events.select("user_id", "event_type", key)
    reached = ev.filter(F.col("event_type") == stages[0]).groupBy("user_id").agg(
        F.min("k").alias("t")
    )
    out_rows = [(1, stages[0], reached)]
    for i, st in enumerate(stages[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == st)
            .join(reached, "user_id")
            .filter(F.col("k") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("k").alias("t"))
        )
        out_rows.append((i, st, nxt))
        reached = nxt
    counts = None
    for i, st, df in out_rows:
        c = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(st).alias("stage"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users): weekly cohort retention —
    cohort = ISO week of the user's first event, and for every later
    week in which the user is active, one distinct-user count at that
    week offset.  ``cohort_week`` is emitted as an ISO date STRING
    (date_format) so the driver canonicalizer hashes it identically to
    the DuckDB twin (DATE → pandas Timestamp tag mismatch otherwise —
    the q_kg_validity lesson)."""
    wk = F.date_trunc("week", F.col("ts").cast("timestamp"))
    active = events.select(
        "user_id", wk.alias("week")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
            "n_users",
        )
    )


def markov_transitions(events: DataFrame, ndigits: int = 6) -> DataFrame:
    """(cur, nxt, cnt, p): per-user event-type bigram counts over the
    (ts, event_id) total order and the row-normalized transition
    probability p = cnt / Σ_nxt cnt — the next-action model (Markov
    chain of order 1) behind session-abandonment and prefetch
    heuristics."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = pairs.groupBy("cur").agg(F.sum("cnt").alias("tot"))
    return pairs.join(totals, "cur").select(
        "cur",
        "nxt",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt").cast("double") / F.col("tot"), ndigits).alias("p"),
    )


def wow_counts(events: DataFrame, ndigits: int = 6) -> DataFrame:
    """Week-over-week activity deltas per event type: ``(event_type,
    day, cnt, prev_cnt, wow, anomaly)`` where wow = cnt/prev_cnt
    against the SAME WEEKDAY one week earlier (join on day−7, not
    lag-over-present-rows — missing days must not silently shift the
    comparison) and anomaly flags ratios outside [0.5, 2] — the
    first-line drift/outage monitor over any ingested stream.  Two
    day-level aggregates and one slim self-equi-join on (type, day−7);
    day emitted as an ISO string for canonicalizer parity."""
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    daily = events.groupBy(
        "event_type", day.alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    prev = daily.select(
        F.col("event_type").alias("prev_type"),
        F.col("day").alias("prev_day"),
        F.col("cnt").alias("prev_cnt"),
    )
    j = daily.join(
        prev,
        (F.col("event_type") == F.col("prev_type"))
        & (F.col("prev_day") + F.expr("INTERVAL 7 DAYS") == F.col("day")),
        "left",
    )
    wow = F.col("cnt").cast("double") / F.col("prev_cnt")
    return j.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        # -1 sentinel for "no week-ago row": a nullable BIGINT comes
        # back from DuckDB's pandas bridge as float64 and breaks the
        # type-tagged compare (the q_hybrid_rrf lesson)
        F.coalesce("prev_cnt", F.lit(-1)).cast("long").alias("prev_cnt"),
        F.coalesce(F.round(wow, ndigits), F.lit(-1.0)).alias("wow"),
        F.coalesce((wow < 0.5) | (wow > 2.0), F.lit(False)).alias("anomaly"),
    )


def json_key_profile(
    df: DataFrame, json_col: str, keys: list[str]
) -> DataFrame:
    """Semi-structured profiling of a JSON string column over a FIXED
    key list: ``(key, n_present, n_numeric, n_distinct)`` — presence,
    integer-typedness (full-string digit match), and value cardinality
    per key; the schema-drift monitor for an ingested event/props
    payload.  Literal JSON paths keep both engines on their native
    extractors (get_json_object / json_extract_string — dynamic paths
    are not portable); one aggregate per key over map-side extraction,
    unioned — key lists are short, rows are not."""
    out = None
    for k in keys:
        v = F.get_json_object(F.col(json_col), f"$.{k}")
        agg = (
            df.select(v.alias("v"))
            .agg(
                F.count("v").cast("long").alias("n_present"),
                F.count(
                    F.when(F.col("v").rlike(r"^-?[0-9]+$"), F.lit(1))
                ).cast("long").alias("n_numeric"),
                F.count_distinct("v").cast("long").alias("n_distinct"),
            )
            .select(F.lit(k).alias("key"), "n_present", "n_numeric", "n_distinct")
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def ab_test(
    events: DataFrame, conv_type: str = "purchase", min_events: int = 15,
    ndigits: int = 6,
) -> DataFrame:
    """Two-proportion z-test between the deterministic A/B split
    user_id % 2: conversion = the user emitted ≥ ``min_events``
    ``conv_type`` events.  One row: (n0, c0, n1, c1, p0, p1, z,
    degenerate) with the pooled-variance statistic

        z = (p1 − p0) / √( p̂(1−p̂)(1/n0 + 1/n1) ),  p̂ = (c0+c1)/(n0+n1)

    — the experiment-readout primitive.  Per-user conversion reduces
    events to a user-sized table (one hash aggregate); the four counts
    come from ONE conditional global aggregate; the z arithmetic is a
    fixed float chain over exact integers, mirrored term-for-term in
    the SQL twin.  Degenerate splits (an empty arm or p̂ ∈ {0, 1}) set
    degenerate=true and the 0.0 SENTINEL for z — a NULL double comes
    back from DuckDB's pandas bridge as NaN and breaks type-tagged
    parity (the q_wow_anomaly lesson)."""
    per_user = events.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == conv_type).cast("int"))
            >= min_events
        ).cast("int").alias("conv")
    )
    v = (F.col("user_id") % 2).alias("variant")
    g = per_user.select(v, "conv").agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("long").alias("n0"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, F.col("conv"))), F.lit(0)
        ).cast("long").alias("c0"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("long").alias("n1"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, F.col("conv"))), F.lit(0)
        ).cast("long").alias("c1"),
    )
    n0, c0 = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1, c1 = F.col("n1").cast("double"), F.col("c1").cast("double")
    p0, p1 = c0 / n0, c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    ok = (F.col("n0") > 0) & (F.col("n1") > 0) & (pp > 0.0) & (pp < 1.0)
    z = F.when(ok, (p1 - p0) / se)
    return g.select(
        "n0", "c0", "n1", "c1",
        F.coalesce(F.round(F.when(F.col("n0") > 0, p0), ndigits), F.lit(-1.0)).alias("p0"),
        F.coalesce(F.round(F.when(F.col("n1") > 0, p1), ndigits), F.lit(-1.0)).alias("p1"),
        F.coalesce(F.round(z, ndigits), F.lit(0.0)).alias("z"),
        (~ok).alias("degenerate"),
    )


def coengagement(events: DataFrame) -> DataFrame:
    """Bipartite projection of the user↔event-type graph onto event
    types: ``(t1, t2, n_users)`` = users engaging with BOTH types (t1 <
    t2) — the item-item co-engagement matrix recommender candidate
    generation starts from.  Reduce to distinct (user, type) FIRST
    (event-sized → user·type-sized), then one per-user self-join whose
    fan-out is (types per user)² — bounded by the type vocabulary, so
    hub users cannot go quadratic in events."""
    ut = events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("t1"))
    b = ut.select("user_id", F.col("event_type").alias("t2"))
    return (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def frequent_triples(baskets: DataFrame, min_support: int = 2) -> DataFrame:
    """(pa, pb, pc, support) — frequent 3-itemsets over (basket_id,
    item) rows, the A-priori level-3 pass on top of the pair pass
    (q_copurchase_lift).  Downward closure is load-bearing in the PLAN:
    candidate triples are generated by self-joining the FREQUENT-pair
    table on a shared first item and pruned by requiring the (b, c)
    pair frequent too, and baskets are cut to items that appear in some
    frequent pair BEFORE the triple enumeration — so the within-basket
    triple fan-out runs over the pruned item set, not the raw basket.

    Shuffles: pair count (basket-keyed enumeration + pair aggregate),
    candidate generation over the frequent-pair DIMENSION (broadcast),
    one triple aggregate.  Support counting re-enumerates triples only
    for baskets' pruned items and semi-joins the candidate set before
    the count, keeping the aggregate input candidate-bounded.
    """
    bk = baskets.select(
        F.col(baskets.columns[0]).alias("bid"),
        F.col(baskets.columns[1]).alias("item"),
    ).distinct()
    l = bk.select("bid", F.col("item").alias("a"))
    r = bk.select("bid", F.col("item").alias("b"))
    pairs = (
        l.join(r, "bid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_support)
        .select("a", "b")
    )
    # candidates: (a,b) ⋈ (a,c), b < c, with (b,c) frequent (downward closure)
    cand = (
        pairs.alias("x")
        .join(pairs.alias("y"), F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(
            F.col("x.a").alias("ca"), F.col("x.b").alias("cb"),
            F.col("y.b").alias("cc"),
        )
        .join(
            pairs.select(F.col("a").alias("cb"), F.col("b").alias("cc")),
            ["cb", "cc"],
        )
    )
    # prune baskets to items in some frequent pair, then enumerate
    freq_items = (
        pairs.select(F.col("a").alias("item"))
        .union(pairs.select("b"))
        .distinct()
    )
    bkf = bk.join(F.broadcast(freq_items), "item").select("bid", "item")
    t1 = bkf.select("bid", F.col("item").alias("pa"))
    t2 = bkf.select("bid", F.col("item").alias("pb"))
    t3 = bkf.select("bid", F.col("item").alias("pc"))
    tri = (
        t1.join(t2, "bid")
        .filter(F.col("pa") < F.col("pb"))
        .join(
            F.broadcast(
                cand.select(
                    F.col("ca").alias("pa"), F.col("cb").alias("pb")
                ).distinct()
            ),
            ["pa", "pb"],
        )
        .join(t3, "bid")
        .filter(F.col("pb") < F.col("pc"))
        .join(
            F.broadcast(
                cand.select(
                    F.col("ca").alias("pa"), F.col("cb").alias("pb"),
                    F.col("cc").alias("pc"),
                )
            ),
            ["pa", "pb", "pc"],
        )
    )
    return (
        tri.groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def kaplan_meier(
    events: DataFrame,
    death_type: str = "purchase",
    min_value: float = 400.0,
    ndigits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring over user
    time-to-event: ``(t_h, n_risk, d, c, survival)`` — the duration is
    whole hours from a user's FIRST event to their first "death" event
    (``event_type == death_type AND value >= min_value``); users who
    never hit one are CENSORED at their last observed event.  The
    product-limit estimator S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with the
    standard convention that same-time censorings stay at risk for the
    deaths at that time.  The time-to-conversion / churn readout that a
    plain conversion rate gets wrong whenever observation windows
    differ per user.

    Durations are exact integer hours (``unix_micros`` arithmetic, no
    float time); the survival product is the only float — a windowed
    ``product`` over the duration-sized KM table, same frame order on
    both engines, rounded to ``ndigits``.

    Scale shape: one user-keyed aggregate (3 timestamp min/max), then
    everything — the (t, d, c) table, the at-risk window, the product
    — runs on the DISTINCT-DURATION table.  N broadcasts back as a
    1-row literal.
    """
    j = _km_risk_table(events, death_type, min_value)
    w = Window.orderBy("t_h")
    factor = F.lit(1.0) - F.col("d") / F.col("n_risk")
    surv = F.product(factor).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "t_h",
        "n_risk",
        "d",
        "c",
        F.round(surv, ndigits).alias("survival"),
    )


def _km_risk_table(
    events: DataFrame, death_type: str, min_value: float
) -> DataFrame:
    """Shared (t_h, d, c, n_risk) at-risk table of the survival family
    — ONE derivation of durations, deaths, censorings and the at-risk
    counts that :func:`kaplan_meier` (product-limit) and
    :func:`nelson_aalen` (cumulative hazard) fold differently."""
    cond = (F.col("event_type") == death_type) & (
        F.col("value") >= min_value
    )
    per = events.groupBy("user_id").agg(
        F.min("ts").alias("fst"),
        F.max("ts").alias("lst"),
        F.min(F.when(cond, F.col("ts"))).alias("dth"),
    )
    per2 = per.select(
        # cast: parquet timestamps arrive as TIMESTAMP_NTZ, which
        # unix_micros rejects; the difference is timezone-invariant
        F.expr(
            "(unix_micros(cast(coalesce(dth, lst) as timestamp))"
            " - unix_micros(cast(fst as timestamp))) DIV 3600000000"
        ).alias("t_h"),
        F.col("dth").isNotNull().alias("obs"),
    )
    tbl = per2.groupBy("t_h").agg(
        F.sum(F.col("obs").cast("long")).cast("long").alias("d"),
        F.sum((~F.col("obs")).cast("long")).cast("long").alias("c"),
    )
    n = per2.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w = Window.orderBy("t_h")
    prior = F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return tbl.crossJoin(F.broadcast(n)).withColumn(
        "n_risk", (F.col("n_users") - prior).cast("long")
    )


def nelson_aalen(
    events: DataFrame,
    death_type: str = "purchase",
    min_value: float = 400.0,
    ndigits: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over the SAME at-risk
    table as :func:`kaplan_meier` — ``(t_h, n_risk, d, c, cum_hazard,
    se)`` with H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ and the standard variance
    Σ dᵢ/nᵢ²; the hazard-scale companion the KM curve can't give you
    (hazards ADD across competing risks, survival products don't), and
    the better small-risk-set estimator (no 1−d/n collapse at n=d).

    Per-time terms are one division each of exact BIGINTs; the
    cumulative Σ runs in the same fixed ORDER BY t frame on both
    engines (the KM windowed-product device).  Same scale shape as KM:
    everything after the user-keyed aggregate lives on the
    distinct-duration table.
    """
    j = _km_risk_table(events, death_type, min_value)
    w = Window.orderBy("t_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.col("d").cast("double") / F.col("n_risk").cast("double")
    vterm = F.col("d").cast("double") / (
        F.col("n_risk").cast("double") * F.col("n_risk").cast("double")
    )
    return j.select(
        "t_h",
        "n_risk",
        "d",
        "c",
        F.round(F.sum(term).over(w), ndigits).alias("cum_hazard"),
        F.round(F.sqrt(F.sum(vterm).over(w)), ndigits).alias("se"),
    )


def multi_touch_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_h: int = 72,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution:
    ``(channel, n_touchpoints, credited)`` — every conversion's value
    is split across the touch events of the same user inside the
    preceding ``window_h`` hours: 40% first touch, 40% last touch, 20%
    spread over the middles (one touch takes 100%, two split 50/50);
    conversions with no touch in the window credit a ``direct``
    channel.  The credit model a marketing/referral dashboard runs
    where last-touch alone misstates discovery channels.

    Exactness: credits are integer MICRO-shares (the only division is
    rounded to an integer per touch, identically on both engines) and
    values integer cents, so the channel sums are exact integer
    arithmetic with two rendering divisions at the end.

    Scale shape: one user-keyed equi-join of conversions onto touches
    with the time window as a join-stage filter (per-user fan-out is
    session-bounded); the position window partitions by conversion id;
    channel sums are map-side-combined aggregates.  At crawl scale the
    join pre-buckets both sides on user_id.
    """
    conv = events.where(F.col("event_type") == conv_type).select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = events.where(
        F.col("event_type").isin(list(touch_types))
    ).select(
        F.col("user_id").alias("tu"),
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    win_us = window_h * 3600 * 1000000
    j = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("tts") < F.col("cts"))
        & (
            F.expr("unix_micros(cast(tts as timestamp))")
            >= F.expr("unix_micros(cast(cts as timestamp))") - F.lit(win_us)
        ),
        "left",
    )
    w = Window.partitionBy("cid").orderBy("tts", "tid")
    k = F.count("tid").over(Window.partitionBy("cid"))
    rn = F.row_number().over(w)
    credit_u = (
        F.when(F.col("tid").isNull(), F.lit(1000000))
        .when(k == 1, F.lit(1000000))
        .when(k == 2, F.lit(500000))
        .when((rn == 1) | (rn == k), F.lit(400000))
        .otherwise(F.round(F.lit(200000) / (k - 2)).cast("long"))
    ).cast("long")
    rows = j.select(
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
        (F.col("tid").isNotNull()).cast("long").alias("is_touch"),
        (credit_u.cast("decimal(38,0)") * F.col("cents")).alias("cv"),
    )
    return rows.groupBy("channel").agg(
        F.sum("is_touch").cast("long").alias("n_touchpoints"),
        F.round(
            F.sum("cv").cast("decimal(38,0)").cast("double")
            / 1000000.0
            / 100.0,
            4,
        ).alias("credited"),
    )


def conversion_lag(
    events: DataFrame,
    from_type: str = "signup",
    to_type: str = "purchase",
) -> DataFrame:
    """Exact conversion-lag order statistics: one row ``(n_from,
    n_converted, median2_h, median_h, p90_h)`` — whole hours from a
    user's first ``from_type`` event to their first ``to_type`` event
    STRICTLY after it; users who never convert are excluded (pair with
    kaplan_meier when censoring must count).  median·2 stays an
    integer (the group_order_stats half-point device), p90 is
    os(⌈0.9·n⌉); the only float is the one rendering division.

    One user-keyed aggregate for the two first-event times, then the
    frequency/cumulative order-statistic machinery on the
    DISTINCT-LAG table.
    """
    fs = F.min(
        F.when(F.col("event_type") == from_type, F.col("ts"))
    ).alias("fs")
    per = events.groupBy("user_id").agg(fs)
    tp = (
        events.where(F.col("event_type") == to_type)
        .join(per, "user_id")
        .where(F.col("ts") > F.col("fs"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"), F.min("fs").alias("fs"))
    )
    lags = tp.select(
        F.expr(
            "(unix_micros(cast(tp as timestamp))"
            " - unix_micros(cast(fs as timestamp))) DIV 3600000000"
        ).alias("h")
    )
    freq = lags.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("f"))
    w = Window.orderBy("h")
    cum = freq.select("h", F.sum("f").over(w).alias("cum"))
    n = lags.agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    nf = per.where(F.col("fs").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_from")
    )
    j = cum.crossJoin(F.broadcast(n))
    stats = j.agg(
        (
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n_converted + 1) DIV 2"),
                    F.col("h"),
                )
            )
            + F.min(
                F.when(
                    F.col("cum") >= F.expr("(n_converted + 2) DIV 2"),
                    F.col("h"),
                )
            )
        ).alias("median2_h"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(9 * n_converted + 9) DIV 10"),
                F.col("h"),
            )
        ).alias("p90_h"),
    )
    return (
        nf.crossJoin(n)
        .crossJoin(stats)
        .select(
            "n_from",
            "n_converted",
            "median2_h",
            F.round(F.col("median2_h") / 2.0, 6).alias("median_h"),
            "p90_h",
        )
    )


def item_recs(events: DataFrame, k_top: int = 3) -> DataFrame:
    """Item-item collaborative-filtering recommendations over the
    (user, item) engagement graph, item = the ``k`` property of the
    event payload: ``(user_id, item, score_milli, rank)`` — top
    ``k_top`` unseen items per user, scored by the summed squared-
    cosine similarity to the user's own items.  The classic itemCF
    recommender (Sarwar et al.) in its exact-integer form: sim_milli =
    round(10⁶·c²ᵢⱼ/(cᵢ·cⱼ)) is rounded ONCE per item pair, so user
    scores are integer sums — no float accumulation anywhere.

    Scale shape: reduce to DISTINCT (user, item) first; co-occurrence
    is a per-user self-join whose fan-out is (items per user)² —
    production caps items-per-user, the exact two_hop_paths
    discipline; item-count and similarity tables are item²-bounded and
    broadcast; the rec join fans each user's items into the similarity
    rows once, with seen items removed by one anti-join-shaped filter.
    """
    ui = (
        events.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    ci = ui.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = ui.select("user_id", F.col("item").alias("i"))
    b = ui.select("user_id", F.col("item").alias("j"))
    cij = (
        a.join(b, "user_id")
        .where(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("cij"))
    )
    sim = (
        cij.join(F.broadcast(ci.selectExpr("item as i", "c as c_i")), "i")
        .join(F.broadcast(ci.selectExpr("item as j", "c as c_j")), "j")
        .select(
            "i",
            "j",
            F.round(
                F.lit(1000000)
                * (F.col("cij") * F.col("cij")).cast("double")
                / (F.col("c_i") * F.col("c_j"))
            )
            .cast("long")
            .alias("s_milli"),
        )
    )
    cand = (
        ui.select("user_id", F.col("item").alias("i"))
        .join(sim, "i")
        .join(
            ui.selectExpr("user_id", "item as j").withColumn(
                "seen", F.lit(1)
            ),
            ["user_id", "j"],
            "left",
        )
        .where(F.col("seen").isNull())
        .groupBy("user_id", F.col("j").alias("item"))
        .agg(F.sum("s_milli").cast("long").alias("score_milli"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score_milli").desc(), F.col("item").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_top)
        .select("user_id", "item", "score_milli", "rank")
    )


def peak_concurrency(
    events: DataFrame, gap_s: int = 1800
) -> DataFrame:
    """Peak concurrent sessions by the ±1 sweep: one row
    ``(n_sessions, peak, peak_at_us)`` — sessionize per user with the
    standard ``gap_s`` inactivity rule, turn each session into a
    CLOSED [start, end] interval (a session is active at its
    last-event instant, and a single-event session is a point
    interval), and sweep the endpoints in time order with starts
    processed before ends at equal instants — the closed-interval
    convention; point sessions count.  ``peak_at_us`` is the EARLIEST
    instant achieving the peak — deterministic.  The capacity number
    an ingestion/serving planner actually needs; a per-hour GROUP BY
    undercounts whenever sessions straddle bucket edges.

    Exact integer micros throughout.  Shapes: the session reduction is
    the one user-keyed window the session family already pays; the
    sweep's cumulative window runs over the 2·sessions endpoint table
    (session-sized, not event-sized).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = (
        events.withColumn(
            "sid",
            F.coalesce(
                F.sum((gap > gap_s * 1_000_000).cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min(us).alias("s"), F.max(us).alias("e"))
    )
    deltas = sess.select(
        F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(sess.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
    ws = Window.orderBy(F.col("t"), F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = deltas.withColumn("cur", F.sum("d").over(ws))
    n = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    peak = run.agg(F.max("cur").cast("long").alias("peak"))
    at = (
        run.crossJoin(F.broadcast(peak))
        .where(F.col("cur") == F.col("peak"))
        .agg(F.min("t").cast("long").alias("peak_at_us"))
    )
    return n.crossJoin(peak).crossJoin(at)


def seq_pattern_support(events: DataFrame, min_support: int = 1) -> DataFrame:
    """Sequential-pattern support (the length-3 PrefixSpan readout):
    ``(e1, e2, e3, support)`` — for every ordered event-type triple
    (repeats allowed), the number of distinct users whose history
    contains the SUBSEQUENCE e1 < e2 < e3 under the composite
    (ts, event_id) key (funnel_counts' packed-string device, so ties
    are deterministic).

    Greedy-earliest matching is exact for subsequence EXISTENCE: a
    user supports the pattern iff taking t1 = min key of e1, then the
    min e2 key strictly after t1, then any e3 strictly after that,
    succeeds.  Unlike funnel_counts (one fixed stage chain) this mines
    ALL |T|³ chains at once.

    Scale shape: three aggregates and two joins, all on the SAME
    user_id shuffle key; fan-out is |events| × |T| then × |T|² —
    bounded by the TYPE VOCABULARY (five here), never by users or by
    pattern count, so the plan survives arbitrary corpus growth as
    long as the event-type alphabet stays small (the PrefixSpan
    projected-database trick in DataFrame form).
    """
    key = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"
        ),
        F.lit("#"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    ).alias("k")
    ev = events.select("user_id", "event_type", key)
    t1 = ev.groupBy("user_id", F.col("event_type").alias("e1")).agg(
        F.min("k").alias("t1")
    )
    t2 = (
        ev.join(t1, "user_id")
        .filter(F.col("k") > F.col("t1"))
        .groupBy("user_id", "e1", F.col("event_type").alias("e2"))
        .agg(F.min("k").alias("t2"))
    )
    t3 = (
        ev.join(t2, "user_id")
        .filter(F.col("k") > F.col("t2"))
        .select("user_id", "e1", "e2", F.col("event_type").alias("e3"))
        .distinct()
    )
    return (
        t3.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def seasonal_decompose(
    events: DataFrame,
    period: int = 7,
    ndigits: int = 6,
    cents: int = 100,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method behind STL's initial pass) of the per-type daily event-value
    series: trend = centered ``period``-day moving average over
    observed days (full windows only — edges stay NULL rather than
    biased), seasonal = the per-(type, day-of-week) mean of the
    detrended series, remainder = daily − trend − seasonal.  The
    drift/anomaly screen that separates "traffic grew" from "Mondays
    are like that" before alerting on crawl volume.

    DETERMINISM (the repo's exact-sums contract): daily totals are
    ``cents``-scaled BIGINTs, the MA is an integer window SUM, and the
    seasonal mean is an integer numerator Σ(period·daily_c − sum_c)
    over an integer denominator — so every emitted number is ONE
    double division of exact integers, bit-identical regardless of
    aggregation order (a float-mean formulation measurably straddles
    the 1e-6 rounding grid between JVM and DuckDB partial-agg orders).
    The conventional zero-centering of the seasonal indices is a
    presentation offset (a float mean of the per-dow means) and is
    deliberately omitted to keep that property; daily = trend +
    seasonal + remainder still holds exactly.

    Scale shape: one (type, day) pre-aggregate shrinks the event
    stream to |types|·|days| rows; everything after — the centered MA
    window, the seasonal means, the final join — runs on that tiny
    series table (window partitioned by type, never a global sort).

    Output: ``(event_type, d, daily, trend, seasonal, remainder)``;
    trend/seasonal/remainder NULL outside full MA windows.
    """
    half = period // 2
    den = period * cents
    daily = events.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.round(F.sum("value") * cents, 0).cast("long").alias("daily_c")
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-half, half)
    t = daily.select(
        "event_type",
        "d",
        "daily_c",
        F.when(
            F.count(F.lit(1)).over(w) == period, F.sum("daily_c").over(w)
        ).alias("sum_c"),
    ).select(
        "*",
        F.dayofweek("d").alias("dow"),
        (F.lit(period) * F.col("daily_c") - F.col("sum_c")).alias("num"),
    )
    sm = (
        t.filter(F.col("sum_c").isNotNull())
        .groupBy("event_type", "dow")
        .agg(F.sum("num").alias("s_num"), F.count(F.lit(1)).alias("n_w"))
        .select(
            "event_type",
            "dow",
            (F.col("s_num") / (F.lit(den) * F.col("n_w"))).alias("s_raw"),
        )
    )
    return t.join(sm, ["event_type", "dow"], "left").select(
        "event_type",
        "d",
        F.round(F.col("daily_c") / F.lit(float(cents)), ndigits).alias("daily"),
        F.round(F.col("sum_c") / F.lit(float(den)), ndigits).alias("trend"),
        F.when(F.col("sum_c").isNotNull(), F.round("s_raw", ndigits)).alias(
            "seasonal"
        ),
        F.when(
            F.col("sum_c").isNotNull(),
            F.round(F.col("num") / F.lit(float(den)) - F.col("s_raw"), ndigits),
        ).alias("remainder"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """Trailing ``window_days``-day distinct active users per day and
    event type — the rolling-DAU/WAU family.  Spark (and SQL generally)
    has no COUNT(DISTINCT) over a sliding frame, and holding per-day
    user sets in window state explodes; the scale answer is the
    FAN-OUT rewrite: each (user, day) first collapses to one row (the
    big cardinality drop happens before any widening), then contributes
    itself to the ``window_days`` bucket-days it is visible in (a
    bounded ×w explode of the ALREADY-DEDUPED pairs), and a plain
    hash count-distinct per bucket finishes — map-side combinable, no
    ordered state, no per-day set materialization.

    Only buckets whose full trailing window lies inside the observed
    date span are emitted (edge days would under-count).

    Output: ``(event_type, d, active_users)``.
    """
    pairs = events.select(
        "event_type", F.to_date("ts").alias("ud"), "user_id"
    ).distinct()
    span = events.select(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    fanned = pairs.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(
                F.col("ud"), F.date_add(F.col("ud"), window_days - 1)
            )
        ).alias("d"),
    )
    return (
        fanned.groupBy("event_type", "d")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
        .crossJoin(F.broadcast(span))
        .filter(
            (F.col("d") >= F.date_add(F.col("lo"), window_days - 1))
            & (F.col("d") <= F.col("hi"))
        )
        # ISO string for canonicalizer parity (the retention_cohorts
        # lesson: DATE → pandas Timestamp tag mismatch)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "active_users",
        )
    )


def sprt_daily(
    events: DataFrame,
    p0: float = 0.02,
    p1: float = 0.04,
    alpha: float = 0.05,
    beta: float = 0.05,
    trial_type: str = "view",
    success_type: str = "purchase",
    ndigits: int = 6,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (1945) on the daily
    conversion stream: after each day, the cumulative log-likelihood
    ratio for H1: p = p1 vs H0: p = p0 over (trials = ``trial_type``
    events, successes = ``success_type`` events) is compared to the
    Wald boundaries ln((1−β)/α), ln(β/(1−α)) — the earliest-possible
    stop for an online experiment (vs the fixed-horizon q_ab_test).

    DETERMINISM: llr = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) — both
    logs are PYTHON-EVALUATED LITERALS (the engines never take a log),
    so every llr is two exact-integer×literal products and one sum,
    bit-identical; the boundary comparisons are against literal
    doubles.

    Scale shape: the event stream collapses to one row per day FIRST
    (map-side-combinable conditional counts); the cumulative window and
    the decision flags run on the day-count table.

    Output per day: ``(d, n_trials, n_success, llr, decision)`` with
    decision ∈ {accept_h1, accept_h0, continue} — the state as of that
    day (first crossing day carries the first non-continue label).
    """
    import math

    c1 = math.log(p1 / p0)
    c0 = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == trial_type).cast("long"))
        .cast("long")
        .alias("nt"),
        F.sum((F.col("event_type") == success_type).cast("long"))
        .cast("long")
        .alias("ns"),
    )
    w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "d",
        F.sum("nt").over(w).alias("n_trials"),
        F.sum("ns").over(w).alias("n_success"),
    )
    llr = F.col("n_success") * F.lit(c1) + (
        F.col("n_trials") - F.col("n_success")
    ) * F.lit(c0)
    return cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_trials",
        "n_success",
        F.round(llr, ndigits).alias("llr"),
        F.when(llr >= F.lit(upper), F.lit("accept_h1"))
        .when(llr <= F.lit(lower), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def page_hinkley(
    events: DataFrame,
    delta: float = 0.5,
    lam: float = 50.0,
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Page–Hinkley (Page 1954 / Hinkley 1971) upward change-point
    detection on the daily mean of ``value_col``: per day ``(d, x,
    run_mean, m_t, ph, alarm)`` where ``m_t = Σ_{s≤t}(x_s − μ̂_s − δ)``
    (μ̂_s the running mean up to s), ``ph = m_t − min_{s≤t} m_s``, and
    ``alarm`` fires when ph > λ — the drift monitor a crawl-quality
    dashboard runs on ingest metrics, complementing the windowed CUSUM
    (temporal.py) with the classic self-normalizing sequential form.

    Determinism: the stream collapses to one exact-integer (cents) row
    per day FIRST; x_s and μ̂_s are each ONE division of exact integer
    cumulative sums; the cumulative Σ of the float terms and the
    running min both run under ``ORDER BY d ROWS UNBOUNDED PRECEDING``
    — a fixed evaluation order, so both engines fold the identical
    float sequence and every output bit matches before the render
    round.

    Scale shape: map-side-combinable (day) aggregate; every window
    runs on the day-count table (≤ a few thousand rows for years of
    data) — the corpus is touched once, nothing row-sized is sorted.
    """
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "d",
        (F.col("cents") / F.lit(100.0) / F.col("cnt")).alias("x"),
        (
            F.sum("cents").over(w) / F.lit(100.0) / F.sum("cnt").over(w)
        ).alias("run_mean"),
    )
    term = F.col("x") - F.col("run_mean") - F.lit(delta)
    stepped = cum.select("d", "x", "run_mean", term.alias("term"))
    m_t = F.sum("term").over(w)
    ph_rows = stepped.select(
        "d", "x", "run_mean", m_t.alias("m_t")
    ).select(
        "d",
        "x",
        "run_mean",
        "m_t",
        (F.col("m_t") - F.min("m_t").over(w)).alias("ph"),
    )
    return ph_rows.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.round("x", ndigits).alias("x"),
        F.round("run_mean", ndigits).alias("run_mean"),
        F.round("m_t", ndigits).alias("m_t"),
        F.round("ph", ndigits).alias("ph"),
        (F.col("ph") > F.lit(lam)).alias("alarm"),
    )



def holt_linear(
    events: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.5,
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Holt (1957) linear-trend double exponential smoothing of the
    daily mean of ``value_col``: per day ``(d, x, level, trend,
    fitted)`` under the textbook recursion ``l_t = α·x_t +
    (1−α)(l_{t−1}+b_{t−1})``, ``b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}``,
    one-step-ahead ``fitted_t = l_{t−1}+b_{t−1}`` — the trend-aware
    forecaster next to the trendless EWMA and the seasonal-naive
    baseline, initialized ``l_0 = x_0, b_0 = 0`` (documented so both
    engines replay the identical recurrence).

    Determinism: the stream collapses to one exact-integer (cents) row
    per day FIRST; each ``x_t`` is ONE division of exact longs.  The
    recursion is NOT prefix-sum expressible (each level multiplies the
    previous state), so it runs as a LEFT-TO-RIGHT FOLD over the
    day-sorted series — ``F.aggregate`` over a ``sort_array``-ordered
    struct array here, a day-indexed recursive CTE in the SQL twin —
    with the arithmetic written in the identical operation shape on
    both sides (α and β are exact binary fractions by default), so
    every output bit matches before the render round.  The fold lambda
    inlines ``l_t`` into the ``b_t`` expression (an O(1) scalar
    recompute per step, not the banned computed-array-in-lambda
    pattern — see docs/PLANS.md).

    Scale shape: map-side-combinable (day) aggregate, then the fold
    runs on the DIMENSION-SIZED day series (≤ a few thousand entries
    for years of data) in a single task — the corpus is touched once;
    the collected state is one small array, never row-sized data.
    """
    a = float(alpha)
    b = float(beta)
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    xrows = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        (F.col("cents") / F.lit(100.0) / F.col("cnt")).alias("x"),
    )
    packed = xrows.agg(
        F.sort_array(F.collect_list(F.struct("d", "x"))).alias("series")
    )
    row_t = (
        "array<struct<d:string,x:double,level:double,"
        "trend:double,fitted:double>>"
    )
    init = F.struct(
        F.lit(0.0).alias("lvl"),
        F.lit(0.0).alias("tr"),
        F.array().cast(row_t).alias("rows"),
    )

    def step(acc, e):
        first = F.size(acc["rows"]) == 0
        prev_f = acc["lvl"] + acc["tr"]
        lvl = F.when(first, e["x"]).otherwise(
            F.lit(a) * e["x"] + F.lit(1.0 - a) * (acc["lvl"] + acc["tr"])
        )
        # b_t inlines l_t (scalar O(1) recompute, same shape as the
        # SQL twin's expression)
        tr = F.when(first, F.lit(0.0)).otherwise(
            F.lit(b)
            * (
                (
                    F.lit(a) * e["x"]
                    + F.lit(1.0 - a) * (acc["lvl"] + acc["tr"])
                )
                - acc["lvl"]
            )
            + F.lit(1.0 - b) * acc["tr"]
        )
        fitted = F.when(first, e["x"]).otherwise(prev_f)
        new_row = F.struct(
            e["d"].alias("d"),
            e["x"].alias("x"),
            lvl.alias("level"),
            tr.alias("trend"),
            fitted.alias("fitted"),
        )
        return F.struct(
            lvl.alias("lvl"),
            tr.alias("tr"),
            F.concat(acc["rows"], F.array(new_row)).alias("rows"),
        )

    folded = packed.select(
        F.aggregate("series", init, step)["rows"].alias("rows")
    )
    r = F.col("r")
    return folded.select(F.explode("rows").alias("r")).select(
        r["d"].alias("d"),
        F.round(r["x"], ndigits).alias("x"),
        F.round(r["level"], ndigits).alias("level"),
        F.round(r["trend"], ndigits).alias("trend"),
        F.round(r["fitted"], ndigits).alias("fitted"),
    )


def cuped_adjusted(
    events: DataFrame, split_day: str = "2024-01-16", ndigits: int = 6
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. WSDM'13):
    per user, X = pre-period event count (covariate), Y = post-period
    event count (metric); the adjustment Y′ = Y − θ(X − X̄) with
    θ = cov(X, Y)/var(X) removes the between-user variance X explains.
    One row per deterministic ``user_id % 2`` arm (the q_ab_test
    split): ``(variant, n, mean_y, mean_cuped, theta, rho2)`` where
    rho2 is the squared X–Y correlation = the fraction of metric
    variance CUPED removes.

    Exactness: per-user X/Y are exact BIGINTs; the five global moments
    (n, ΣX, ΣY, ΣXY, ΣX², ΣY²) are exact BIGINT sums; every moment is
    cast to double BEFORE the n·ΣXY-style products (the q_kruskal
    int64-wrap lesson) and θ/rho2/means are fixed-order float chains
    mirrored term-for-term in the twin.  var(X) = 0 (or a singleton
    corpus) sets the 0.0 sentinel for θ/rho2 and mean_cuped = mean_y.

    Scale shape: one user-keyed hash aggregate (map-side combined)
    reduces the event stream to a user-sized table; the global moments
    and the two arm aggregates are single-pass partial aggregates over
    it; the θ scalar rides a broadcast crossJoin.  Nothing shuffles
    except user-sized rows.
    """
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("ts") < F.lit(split_day).cast("timestamp")).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("ts") >= F.lit(split_day).cast("timestamp")).cast("long"))
        .cast("long")
        .alias("y"),
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    ok = (varx_n > 0.0) & (vary_n > 0.0)
    g = mom.select(
        F.when(ok, cov_n / varx_n).otherwise(F.lit(0.0)).alias("theta"),
        F.when(ok, cov_n * cov_n / varx_n / vary_n)
        .otherwise(F.lit(0.0))
        .alias("rho2"),
        (sx / n).alias("xbar"),
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2).cast("long").alias("variant")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.sum("x").cast("long").alias("sxv"),
        F.sum("y").cast("long").alias("syv"),
    )
    j = arms.crossJoin(F.broadcast(g))
    mean_y = F.col("syv").cast("double") / F.col("nv").cast("double")
    mean_x = F.col("sxv").cast("double") / F.col("nv").cast("double")
    return j.select(
        "variant",
        F.col("nv").alias("n"),
        F.round(mean_y, ndigits).alias("mean_y"),
        F.round(
            mean_y - F.col("theta") * (mean_x - F.col("xbar")), ndigits
        ).alias("mean_cuped"),
        F.round("theta", ndigits).alias("theta"),
        F.round("rho2", ndigits).alias("rho2"),
    ).orderBy("variant")


def slope_one_eval(
    events: DataFrame, scale: int = 1000, ndigits: int = 6
) -> DataFrame:
    """Weighted Slope One collaborative filtering (Lemire & Maclachlan,
    SDM 2005) over (user, event_type) mean-value ratings, evaluated
    in-sample: predict every user's rating of each type from their
    OTHER types through the per-pair average deviation, report per
    type ``(event_type, n_pred, mae)`` — the "is a fancier recommender
    even worth it" baseline every CF system is judged against
    (complements :func:`item_recs`' cosine top-k).

    Exactness end-to-end INTEGER: ratings are fixed-point
    ``(Σcents·scale) DIV n`` (the quality_classifier device); each
    pair deviation keeps its EXACT BIGINT numerator Σ_u(r_uj − r_ui)
    and co-count; the weighted prediction collapses algebraically to
    ``Σ_i (devnum_ji + r_ui·c_ji) / Σ_i c_ji`` — exact integer
    numerator and denominator, ONE division per (user, type); per-row
    absolute errors are micro-quantized once (the B³ device) so the
    per-type MAE Σ is an integer sum.

    Scale shape: one map-side-combined (user, type) aggregate; the
    deviation table is a types²-cell fold of the user-keyed self-join
    (|types| bounded — the corpus is touched once); predictions are a
    ratings⋈dev broadcast join, user×types-sized.  No user×user or
    row-pair work anywhere.
    """
    ratings = (
        events.select(
            "user_id",
            F.col("event_type").alias("item"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "item")
        .agg(
            F.sum("cents").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "user_id",
            "item",
            # exact integral division (values are non-negative, so
            # Spark's truncating DIV == DuckDB's flooring //)
            F.expr(f"(s * {scale}) DIV n").cast("long").alias("r"),
        )
    )
    a = ratings.select("user_id", F.col("item").alias("j"), F.col("r").alias("rj"))
    b = ratings.select("user_id", F.col("item").alias("i"), F.col("r").alias("ri"))
    dev = (
        a.join(b, "user_id")
        .where(F.col("j") != F.col("i"))
        .groupBy("j", "i")
        .agg(
            F.sum(F.col("rj") - F.col("ri")).cast("long").alias("devnum"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    pred = (
        ratings.select("user_id", F.col("item").alias("i"), F.col("r").alias("ri"))
        .join(F.broadcast(dev), "i")
        .groupBy("user_id", F.col("j").alias("item"))
        .agg(
            F.sum(F.col("devnum") + F.col("ri") * F.col("c"))
            .cast("long")
            .alias("num"),
            F.sum("c").cast("long").alias("den"),
        )
    )
    scored = pred.join(ratings, ["user_id", "item"]).select(
        "item",
        F.round(
            F.lit(1000000.0)
            * F.abs(
                F.col("num").cast("double") / F.col("den").cast("double")
                - F.col("r").cast("double")
            )
            / F.lit(float(scale))
            / F.lit(100.0),
            0,
        )
        .cast("long")
        .alias("err_q"),
    )
    return (
        scored.groupBy(F.col("item").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pred"),
            F.sum("err_q").cast("long").alias("eq"),
        )
        .select(
            "event_type",
            "n_pred",
            F.round(
                F.col("eq").cast("double")
                / F.col("n_pred").cast("double")
                / F.lit(1000000.0),
                ndigits,
            ).alias("mae"),
        )
    )


def shapley_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    channels: tuple[str, ...] = ("click", "view", "signup"),
    min_value: float = 0.0,
    qscale: int = 10**9,
    ndigits: int = 6,
) -> DataFrame:
    """Data-driven (Shapley-value) channel attribution (Shapley 1953;
    the game-theoretic credit split behind Google Ads' "data-driven
    attribution", replacing the heuristic U-shape of
    :func:`multi_touch_attribution`): coalition value v(S) = conversion
    rate among users whose EXACT touched-channel set is S; each
    channel's credit is its average marginal contribution
    φ_c = Σ_{S ∌ c} |S|!(k−|S|−1)!/k! · (v(S∪c) − v(S)).  One row per
    channel ``(channel, n_exposed, shapley)``; efficiency
    Σφ = v(full) − v(∅) holds by construction (pinned in tests).

    Exactness + scale: the corpus collapses to ≤ 2^k coalition rows in
    ONE user aggregate + one set aggregate (map-side combined); the
    Shapley fold runs on a k·2^(k−1)-row LITERAL spine (k is a small
    config constant) with each weighted marginal micro-quantized ONCE
    at ``qscale`` and integer-summed — the only cross-engine float Σ
    is exact.  v(S) for unobserved coalitions is 0 (no users ⇒ no
    evidence), the standard empirical-DDA convention.
    """
    from itertools import combinations

    k = len(channels)
    if k < 2:
        raise ValueError("shapley_attribution needs >= 2 channels")
    conv = (F.col("event_type") == conv_type) & (
        F.col("value") >= F.lit(float(min_value))
    )
    aggs = [
        F.max(F.when(conv, 1).otherwise(0)).cast("long").alias("conv")
    ]
    for i, c in enumerate(channels):
        aggs.append(
            F.max(F.when(F.col("event_type") == c, 1).otherwise(0))
            .cast("long")
            .alias(f"f{i}")
        )
    per = events.groupBy("user_id").agg(*aggs)
    mask = F.concat(*[F.col(f"f{i}").cast("string") for i in range(k)])
    sets = per.groupBy(mask.alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("cv"),
    )

    import math

    def bitmask(subset):
        return "".join("1" if i in subset else "0" for i in range(k))

    spine_rows = []
    for ci in range(k):
        others = [i for i in range(k) if i != ci]
        for r in range(k):
            for subset in combinations(others, r):
                w = (
                    math.factorial(r)
                    * math.factorial(k - r - 1)
                    / math.factorial(k)
                )
                spine_rows.append(
                    (
                        channels[ci],
                        bitmask(subset),
                        bitmask(set(subset) | {ci}),
                        float(w),
                    )
                )
    spine = events.sparkSession.createDataFrame(
        spine_rows, "channel string, s_without string, s_with string, w double"
    )
    v_without = sets.select(
        F.col("s").alias("s_without"),
        (F.col("cv").cast("double") / F.col("n").cast("double")).alias("v0"),
    )
    v_with = sets.select(
        F.col("s").alias("s_with"),
        (F.col("cv").cast("double") / F.col("n").cast("double")).alias("v1"),
    )
    terms = (
        spine.join(F.broadcast(v_without), "s_without", "left")
        .join(F.broadcast(v_with), "s_with", "left")
        .select(
            "channel",
            F.round(
                F.lit(float(qscale))
                * F.col("w")
                * (
                    F.coalesce(F.col("v1"), F.lit(0.0))
                    - F.coalesce(F.col("v0"), F.lit(0.0))
                ),
                0,
            )
            .cast("long")
            .alias("tq"),
        )
    )
    exposed = []
    for i, c in enumerate(channels):
        exposed.append(
            per.agg(
                F.lit(c).alias("channel"),
                F.sum(f"f{i}").cast("long").alias("n_exposed"),
            )
        )
    exp_df = exposed[0]
    for e in exposed[1:]:
        exp_df = exp_df.unionByName(e)
    folded = terms.groupBy("channel").agg(
        F.sum("tq").cast("long").alias("sq")
    )
    return folded.join(F.broadcast(exp_df), "channel").select(
        "channel",
        "n_exposed",
        F.round(
            F.col("sq").cast("double") / F.lit(float(qscale)), ndigits
        ).alias("shapley"),
    )


def sax_symbols(
    events: DataFrame,
    window_days: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """SAX symbolization (Lin/Keogh et al., DMKD 2007) of each event
    type's daily-mean series: PAA-average the fixed-point daily means
    over ``window_days`` segments, z-normalize per type, map through
    the Gaussian-quartile breakpoints (−0.6745, 0, 0.6745) to a 4-
    letter alphabet — ``(event_type, seg, paa_q, z, symbol)``.  The
    discretization under every motif/anomaly-mining pipeline: two
    series behave alike iff their SAX strings match, at 1/window the
    data rate.

    Determinism: daily means and PAA segment means are FIXED-POINT
    integral divisions (daily cents·10³ DIV n; the PAA mean divides
    the already-scaled mv so its square stays far inside int64), so
    the per-type z moments are exact BIGINTs; z is one fixed float
    chain and the breakpoint CASE compares identical doubles on both
    engines (breakpoints are literals, not computed quantiles).  Types
    with < 2 segments or zero variance emit z = 0 → symbol 'c' (flat
    series — no information, not an error).

    Scale: the stream collapses to |types|·|days| rows in one
    map-side-combined aggregate; everything after is segment-sized.
    """
    daily = (
        events.select(
            F.col("event_type").alias("t"),
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("t", "d")
        .agg(
            F.sum("cents").cast("long").alias("dc"),
            F.count(F.lit(1)).cast("long").alias("dn"),
        )
        .select(
            "t", "d", F.expr("(dc * 1000) DIV dn").cast("long").alias("mv")
        )
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    seg = daily.crossJoin(F.broadcast(d0)).select(
        "t",
        F.expr(f"datediff(d, d0) DIV {window_days}").cast("long").alias("seg"),
        "mv",
    )
    paa = seg.groupBy("t", "seg").agg(
        F.expr("sum(mv) DIV count(*)").cast("long").alias("paa_q")
    )
    mom = paa.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("paa_q").cast("long").alias("sp"),
        F.sum(F.col("paa_q") * F.col("paa_q")).cast("long").alias("qp"),
    )
    var = (
        (F.col("s") * F.col("qp") - F.col("sp") * F.col("sp")).cast("double")
        / (F.col("s") * (F.col("s") - F.lit(1))).cast("double")
    )
    z = F.when(
        (F.col("s") >= 2) & (var > 0),
        (
            F.col("paa_q").cast("double")
            - F.col("sp").cast("double") / F.col("s").cast("double")
        )
        / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    sym = (
        F.when(F.col("z") < -0.6745, F.lit("a"))
        .when(F.col("z") < 0.0, F.lit("b"))
        .when(F.col("z") < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        paa.join(F.broadcast(mom), "t")
        .select(
            F.col("t").alias("event_type"),
            "seg",
            "paa_q",
            F.round(z, ndigits).alias("z"),
        )
        .withColumn("symbol", sym)
    )


def croston_forecast(
    events: DataFrame,
    demand_type: str = "purchase",
    min_value: float = 0.0,
    alpha: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Croston's method (Croston, Oper. Res. Q. 1972) for INTERMITTENT
    demand — the forecaster for series that are mostly zeros, where
    plain SES chases the gaps: per day ``(d, demand, z, p, forecast)``
    with separate exponential smoothing of nonzero demand SIZES (z)
    and inter-demand INTERVALS (p), forecast = z/p, both updated only
    on demand days.  The spare-parts/long-tail-sku standard next to
    [[q_ewma]] (trendless), [[q_holt]] (trend) and
    [[q_seasonal_naive]].

    Determinism: the day spine zero-fills gaps (the autocorrelation
    device) so intervals are exact integer day counts; α = ½ keeps
    every smoothing coefficient an exact binary fraction, and the
    recursion runs as the :func:`holt_linear` LEFT-TO-RIGHT FOLD over
    the day-sorted series (recursive-CTE twin) — identical operation
    shape both engines, p ≥ 1 whenever started so the forecast
    division is never 0/0.  Days before the first demand report
    z = p = forecast = 0 (cold start, not NULL).
    """
    a = float(alpha)
    daily = (
        events.where(
            (F.col("event_type") == demand_type)
            & (F.col("value") >= F.lit(float(min_value)))
        )
        .groupBy(F.to_date("ts").alias("dd"))
        .agg(F.count(F.lit(1)).cast("long").alias("dmd"))
    )
    rng = events.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("dd"))
    filled = spine.join(daily, "dd", "left").select(
        F.date_format("dd", "yyyy-MM-dd").alias("d"),
        F.coalesce("dmd", F.lit(0)).cast("long").alias("dmd"),
    )
    packed = filled.agg(
        F.sort_array(F.collect_list(F.struct("d", "dmd"))).alias("series")
    )
    row_t = (
        "array<struct<d:string,demand:bigint,z:double,p:double,"
        "forecast:double>>"
    )
    init = F.struct(
        F.lit(0.0).alias("z"),
        F.lit(0.0).alias("p"),
        F.lit(0).cast("long").alias("q"),
        F.lit(False).alias("started"),
        F.array().cast(row_t).alias("rows"),
    )

    def step(acc, e):
        qq = acc["q"] + 1
        is_d = e["dmd"] > 0
        z = F.when(
            is_d & ~acc["started"], e["dmd"].cast("double")
        ).when(
            is_d,
            F.lit(a) * e["dmd"].cast("double") + F.lit(1.0 - a) * acc["z"],
        ).otherwise(acc["z"])
        p = F.when(
            is_d & ~acc["started"], qq.cast("double")
        ).when(
            is_d, F.lit(a) * qq.cast("double") + F.lit(1.0 - a) * acc["p"]
        ).otherwise(acc["p"])
        started = acc["started"] | is_d
        fc = F.when(started, z / p).otherwise(F.lit(0.0))
        new_row = F.struct(
            e["d"].alias("d"),
            e["dmd"].alias("demand"),
            z.alias("z"),
            p.alias("p"),
            fc.alias("forecast"),
        )
        return F.struct(
            z.alias("z"),
            p.alias("p"),
            F.when(is_d, F.lit(0).cast("long")).otherwise(qq).alias("q"),
            started.alias("started"),
            F.concat(acc["rows"], F.array(new_row)).alias("rows"),
        )

    folded = packed.select(
        F.aggregate("series", init, step)["rows"].alias("rows")
    )
    r = F.col("r")
    return folded.select(F.explode("rows").alias("r")).select(
        r["d"].alias("d"),
        r["demand"].alias("demand"),
        F.round(r["z"], ndigits).alias("z"),
        F.round(r["p"], ndigits).alias("p"),
        F.round(r["forecast"], ndigits).alias("forecast"),
    )


def srm_check(events: DataFrame, ndigits: int = 6) -> DataFrame:
    """Sample-ratio-mismatch guardrail (the first check every
    experimentation platform runs — Fabijan et al., KDD 2019 call SRM
    "the most useful A/B test diagnostic"): users assign to two arms
    by the deterministic ``user_id % 2`` split; under a healthy 50/50
    ramp the arm-count gap is a random walk of ±1 steps, so
    z = (n_a − n_b)/√N and χ² = z² (df 1).  One row ``(n, n_a, n_b, z,
    chi2, srm_flag)`` with the |z| > 3 red flag — an SRM means the
    ASSIGNMENT is broken and every downstream metric (q_ab_test,
    q_cuped, q_did) is garbage, which is why this ships next to them.

    One user-level aggregate (map-side combined), three exact BIGINTs,
    a two-op float chain.
    """
    per = events.select("user_id").distinct()
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    z = F.when(
        F.col("n") > 0,
        (F.col("n_a") - F.col("n_b")).cast("double")
        / F.sqrt(F.col("n").cast("double")),
    ).otherwise(F.lit(0.0))
    return g.select(
        "n",
        "n_a",
        "n_b",
        F.round(z, ndigits).alias("z"),
        F.round(z * z, ndigits).alias("chi2"),
        (F.abs(z) > 3.0).alias("srm_flag"),
    )


def sbg_retention(events: DataFrame, ndigits: int = 6) -> DataFrame:
    """Shifted-beta-geometric retention projection (Fader & Hardie,
    "How to Project Customer Retention", J. Interactive Marketing
    2007) fit CLOSED-FORM on the first two retention ratios of the
    earliest weekly cohort, validated against the observed weeks the
    fit never saw: one row ``(n0, r1, r2, alpha, beta, r3_obs,
    r3_proj, r4_obs, r4_proj)``.  The sBG's defining property —
    retention RATIOS rise over time as the flaky users wash out —
    is exactly what naive geometric churn extrapolation misses.

    From r₁ = β/(α+β), r₂/r₁ = (β+1)/(α+β+1):
    β = (r₂−r₁)·r₁/(r₁²−r₂), α = β(1−r₁)/r₁, and the projection
    recursion r_t = r_{t−1}·(β+t−1)/(α+β+t−1).

    Censoring is handled by CONSTRUCTION: only the earliest cohort
    (first-week users, fully observed across the window) enters, so
    every rate is an exact count ratio.  Fixed float chains over four
    BIGINTs; degenerate fits (r₁² = r₂, r₁ = 0) report zero
    projections lazily.
    """
    wk = F.date_trunc("week", F.col("ts").cast("timestamp"))
    active = events.select("user_id", wk.alias("week")).distinct()
    w0 = active.agg(F.min("week").alias("w0"))
    cohort = (
        active.groupBy("user_id")
        .agg(F.min("week").alias("cw"))
        .crossJoin(F.broadcast(w0))
        .where(F.col("cw") == F.col("w0"))
        .select("user_id")
    )
    offs = (
        active.join(cohort, "user_id")
        .crossJoin(F.broadcast(w0))
        .select(
            (F.datediff(F.col("week"), F.col("w0")) / 7)
            .cast("long")
            .alias("t"),
            "user_id",
        )
        .groupBy("t")
        .agg(F.count_distinct("user_id").cast("long").alias("n"))
    )
    g = offs.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("t") == t, F.col("n"))), F.lit(0)
            )
            .cast("long")
            .alias(f"n{t}")
            for t in range(5)
        ]
    )
    n0 = F.col("n0").cast("double")
    r = {
        t: F.when(
            F.col("n0") > 0, F.col(f"n{t}").cast("double") / n0
        ).otherwise(F.lit(0.0))
        for t in (1, 2, 3, 4)
    }
    den = r[1] * r[1] - r[2]
    ok = (F.col("n0") > 0) & (den != 0) & (r[1] > 0)
    beta = F.when(ok, (r[2] - r[1]) * r[1] / den).otherwise(F.lit(0.0))
    alpha = F.when(
        ok, beta * (F.lit(1.0) - r[1]) / r[1]
    ).otherwise(F.lit(0.0))
    r3p = F.when(
        ok,
        r[2] * (beta + F.lit(2.0)) / (alpha + beta + F.lit(2.0)),
    ).otherwise(F.lit(0.0))
    r4p = F.when(
        ok,
        r[2]
        * (beta + F.lit(2.0))
        / (alpha + beta + F.lit(2.0))
        * (beta + F.lit(3.0))
        / (alpha + beta + F.lit(3.0)),
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col("n0").alias("n0"),
        F.round(r[1], ndigits).alias("r1"),
        F.round(r[2], ndigits).alias("r2"),
        F.round(alpha, ndigits).alias("alpha"),
        F.round(beta, ndigits).alias("beta"),
        F.round(r[3], ndigits).alias("r3_obs"),
        F.round(r3p, ndigits).alias("r3_proj"),
        F.round(r[4], ndigits).alias("r4_obs"),
        F.round(r4p, ndigits).alias("r4_proj"),
    )


def cohort_ltv(events: DataFrame, ndigits: int = 6) -> DataFrame:
    """Weekly-cohort cumulative lifetime value: ``(cohort_week,
    week_offset, cohort_size, cum_cents, ltv)`` — cumulative revenue
    per cohort member at each week offset, the money-side companion to
    :func:`retention_cohorts` (retention says who came back, LTV says
    what they were worth) and the payback-period readout every
    acquisition budget is judged by.

    Exactness: revenue is exact integer cents per (cohort, offset)
    cell; the cumulative Σ is an INTEGER window sum in a fixed
    per-cohort ORDER BY offset frame; ltv is one division (dollars).
    Cohort week is emitted as an ISO string (the retention_cohorts
    canonicalizer lesson).  One corpus pass; everything after is
    cohort×offset-sized.
    """
    wk = F.date_trunc("week", F.col("ts").cast("timestamp"))
    ev = events.select(
        "user_id",
        wk.alias("week"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cw"))
    sizes = cohort.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        ev.join(cohort, "user_id")
        .groupBy(
            "cw",
            (F.datediff(F.col("week"), F.col("cw")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum("cents").cast("long").alias("c"))
    )
    w = Window.partitionBy("cw").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "cw",
        "week_offset",
        F.sum("c").over(w).cast("long").alias("cum_cents"),
    )
    return cum.join(sizes, "cw").select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "cohort_size",
        "cum_cents",
        F.round(
            F.col("cum_cents").cast("double")
            / F.lit(100.0)
            / F.col("cohort_size").cast("double"),
            ndigits,
        ).alias("ltv"),
    )


def holt_winters(
    events: DataFrame,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.5,
    gamma: float = 0.5,
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Holt–Winters ADDITIVE triple exponential smoothing (Winters,
    Mgmt. Sci. 1960) of the daily series with a ``season``-day cycle —
    the level+trend+seasonality forecaster that completes the family
    (:func:`~ddaugner_spark.operators.events.holt_linear` has no
    season, [[q_seasonal_naive]] has nothing BUT the season): per
    post-warmup day ``(d, x, level, trend, season_idx, seasonal,
    fitted)`` under

        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1}+b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(x_t − l_t)    + (1−γ)s_{t−m}
        fitted_t = l_{t−1} + b_{t−1} + s_{t−m}.

    Initialization (documented contract): the first ``season`` days
    are warm-up — l₀ = their EXACT-integer fixed-point mean (x is
    cents·10³ DIV n like sax_symbols, so the Σ is integer), b₀ = 0,
    s₀ᵢ = xᵢ − l₀; warm-up days emit no row.  α=β=γ=½ keep every
    coefficient an exact binary fraction; the recursion is the
    :func:`holt_linear` LEFT-TO-RIGHT FOLD with the seasonal state as
    SEVEN EXPLICIT array slots rebuilt per step (no lambda-with-index
    anywhere — the positional CASE form is what the recursive-CTE twin
    replays verbatim).  l_t inlines into b_t and s_t exactly as the
    twin writes them.
    """
    a, b, g = float(alpha), float(beta), float(gamma)
    m = int(season)
    daily = (
        events.select(
            F.to_date("ts").alias("dd"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("dd")
        .agg(
            F.sum("cents").cast("long").alias("dc"),
            F.count(F.lit(1)).cast("long").alias("dn"),
        )
        .select(
            F.date_format("dd", "yyyy-MM-dd").alias("d"),
            F.expr("(dc * 1000) DIV dn").cast("long").alias("x"),
        )
    )
    w = Window.orderBy("d")
    idx = daily.select(
        "d", "x", F.row_number().over(w).cast("long").alias("i")
    )
    init = idx.where(F.col("i") <= m).agg(
        F.sum("x").cast("long").alias("sx"),
        F.sort_array(F.collect_list(F.struct("i", "x"))).alias("wk"),
    )
    l0 = F.col("sx").cast("double") / F.lit(float(m))
    init_state = init.select(
        l0.alias("l"),
        F.lit(0.0).alias("b"),
        F.array(
            *[
                F.col("wk")[j]["x"].cast("double") - l0
                for j in range(m)
            ]
        ).alias("s"),
    )
    row_t = (
        "array<struct<d:string,x:bigint,level:double,trend:double,"
        "season_idx:bigint,seasonal:double,fitted:double>>"
    )
    packed = (
        idx.where(F.col("i") > m)
        .agg(
            F.sort_array(F.collect_list(F.struct("i", "d", "x"))).alias(
                "series"
            )
        )
        .crossJoin(F.broadcast(init_state))
    )
    init_acc = F.struct(
        F.col("l").alias("l"),
        F.col("b").alias("b"),
        F.col("s").alias("s"),
        F.array().cast(row_t).alias("rows"),
    )

    def step(acc, e):
        pos = ((e["i"] - 1) % m).cast("int")  # 0-based season slot
        s_prev = F.element_at(acc["s"], pos + 1)
        xd = e["x"].cast("double")
        lvl = F.lit(a) * (xd - s_prev) + F.lit(1.0 - a) * (
            acc["l"] + acc["b"]
        )
        tr = F.lit(b) * (
            (
                F.lit(a) * (xd - s_prev)
                + F.lit(1.0 - a) * (acc["l"] + acc["b"])
            )
            - acc["l"]
        ) + F.lit(1.0 - b) * acc["b"]
        snew = F.lit(g) * (
            xd
            - (
                F.lit(a) * (xd - s_prev)
                + F.lit(1.0 - a) * (acc["l"] + acc["b"])
            )
        ) + F.lit(1.0 - g) * s_prev
        fitted = acc["l"] + acc["b"] + s_prev
        new_s = F.array(
            *[
                F.when(F.lit(j) == pos, snew).otherwise(
                    F.element_at(acc["s"], j + 1)
                )
                for j in range(m)
            ]
        )
        new_row = F.struct(
            e["d"].alias("d"),
            e["x"].alias("x"),
            lvl.alias("level"),
            tr.alias("trend"),
            pos.cast("long").alias("season_idx"),
            snew.alias("seasonal"),
            fitted.alias("fitted"),
        )
        return F.struct(
            lvl.alias("l"),
            tr.alias("b"),
            new_s.alias("s"),
            F.concat(acc["rows"], F.array(new_row)).alias("rows"),
        )

    folded = packed.select(
        F.aggregate("series", init_acc, step)["rows"].alias("rows")
    )
    r = F.col("r")
    return folded.select(F.explode("rows").alias("r")).select(
        r["d"].alias("d"),
        r["x"].alias("x"),
        F.round(r["level"], ndigits).alias("level"),
        F.round(r["trend"], ndigits).alias("trend"),
        r["season_idx"].alias("season_idx"),
        F.round(r["seasonal"], ndigits).alias("seasonal"),
        F.round(r["fitted"], ndigits).alias("fitted"),
    )


def poisson_rate_test(
    events: DataFrame,
    event_type: str = "error",
    split_ts: str = "2024-01-16",
    ndigits: int = 6,
) -> DataFrame:
    """Conditional two-sample Poisson rate test (Przyborowski &
    Wilenski, Biometrika 1940 — the exact-conditioning trick): did the
    ``event_type`` rate change across ``split_ts``?  Under H₀ (equal
    rates, equal exposure windows) k₁ | k₁+k₂ is Binomial(K, ½), so
    z = (k₁ − k₂)/√K — the incident-rate regression check next to
    [[q_wow_anomaly]]'s day-over-day ratios and [[q_page_hinkley]]'s
    sequential alarm.  One row ``(k_before, k_after, z, rate_ratio)``.

    Two conditional BIGINT counts, one sqrt, one division — the
    conditioning removes the nuisance baseline entirely (no variance
    estimate, no float mean).  Callers must split the window into
    EQUAL exposures (documented; the gate corpus spans Jan 1-30 and
    splits at the 16th: 15 days each).
    """
    cond = F.col("event_type") == event_type
    before = cond & (F.col("ts") < F.lit(split_ts).cast("timestamp"))
    after = cond & (F.col("ts") >= F.lit(split_ts).cast("timestamp"))
    g = events.agg(
        F.sum(before.cast("long")).cast("long").alias("k_before"),
        F.sum(after.cast("long")).cast("long").alias("k_after"),
    )
    kk = (F.col("k_before") + F.col("k_after")).cast("double")
    z = F.when(
        kk > 0,
        (F.col("k_before") - F.col("k_after")).cast("double") / F.sqrt(kk),
    ).otherwise(F.lit(0.0))
    rr = F.when(
        F.col("k_after") > 0,
        F.col("k_before").cast("double") / F.col("k_after").cast("double"),
    ).otherwise(F.lit(0.0))
    return g.select(
        "k_before", "k_after",
        F.round(z, ndigits).alias("z"),
        F.round(rr, ndigits).alias("rate_ratio"),
    )
