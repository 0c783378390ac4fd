"""Temporal joins the engine adds beyond the reference: AS-OF join.

Spark has no native as-of join (pandas-on-Spark's merge_asof shuffles
through Python); the scalable DataFrame idiom is the UNION + WINDOW
formulation used here:

    tag right rows 0 and left rows 1 → union → one window partitioned by
    the key, ordered by (ts, tag) → ``last(right_value, ignorenulls)``
    over unbounded-preceding rows carries the most recent right row
    forward → keep left rows.

One wide stage over the combined stream (the window — no join operator
at all, pytest-pinned) plus the right side's own per-(key, ts) dedup
aggregate; no row explosion — the classic log-enrichment shape (match
each event to the latest state/quote at or before it).  Ties: right rows are deduplicated to one row per
(key, ts) with ``max_by(·, tiebreak)`` so the match is deterministic;
at equal timestamps the right row sorts first (tag 0 < 1), giving
``<=`` as-of semantics — exactly DuckDB's ASOF JOIN, which the oracle
(q_asof_events) uses natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts, seconds: int):
    """Arbitrary-width time bucket (TimescaleDB ``time_bucket`` shape):
    the bucket's start timestamp."""
    us = seconds * 1_000_000
    return F.timestamp_micros(
        (F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / us) * us).cast("long")
    )


def hypertable_rollup(
    events: DataFrame,
    ts: str,
    value: str,
    bucket_seconds: int,
    group_cols: list[str],
) -> DataFrame:
    """Continuous-aggregate base table: (bucket_ts, group…, n, sum_v).

    Only DECOMPOSABLE aggregates (count/sum/min/max) are materialized, so
    coarser granularities derive by RE-AGGREGATING this table instead of
    rescanning raw events — the hypertable/continuous-aggregate contract
    (avg = sum/n at read time).  At 10^12 rows the base rollup is the
    only full scan; every dashboard granularity is a rollup-of-rollup."""
    return events.groupBy(
        time_bucket(ts, bucket_seconds).alias("bucket_ts"), *group_cols
    ).agg(F.count("*").alias("n"), F.sum(value).alias("sum_v"))


def coarsen_rollup(
    rollup: DataFrame, bucket_seconds: int, group_cols: list[str]
) -> DataFrame:
    """Derive a coarser continuous aggregate from a finer one (pure
    re-aggregation — never touches raw events)."""
    return rollup.groupBy(
        time_bucket("bucket_ts", bucket_seconds).alias("bucket_ts"), *group_cols
    ).agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))


def merge_rollups(rollups: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Incremental-view-maintenance merge: because the rollup stores
    only DECOMPOSABLE aggregates, ``rollup(base ∪ delta) ==
    merge(rollup(base), rollup(delta))`` — so a new day of events
    re-aggregates ONLY the delta and merges key-sized rollup tables,
    never rescanning the 100 TB base (the continuous-aggregate refresh
    contract; the q_rollup_merge oracle pins the equality by
    recomputing from the full event set)."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), rollups)
    return merged.groupBy("bucket_ts", *group_cols).agg(
        F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    delta_seconds: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs of the same ``key`` with
    ``|left.ts − right.ts| ≤ delta_seconds`` — as a BUCKETED EQUI-JOIN:
    timestamps bucket to ⌊epoch/Δ⌋, the left side fans out to buckets
    {b−1, b, b+1}, the join runs on (key, bucket) and the exact range
    predicate filters after.  A naive theta-join is a per-key cross
    product (quadratic in hub keys); bucketing bounds each task's
    candidates to ±1 bucket — the standard interval-join shape Spark
    lacks natively (Flink's interval join, DuckDB's IEJoin, which the
    oracle uses)."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    delta_us = delta_seconds * 1_000_000
    l = left.select(
        F.col(key),
        us.alias("_lus"),
        F.explode(
            F.array(*[F.lit(o) for o in (-1, 0, 1)])
        ).alias("_off"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
    ).withColumn("_bucket", F.floor(F.col("_lus") / delta_us) + F.col("_off"))
    r = right.select(
        F.col(key),
        us.alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    ).withColumn("_bucket", F.floor(F.col("_rus") / delta_us))
    return (
        l.join(r, [key, "_bucket"])
        .filter(F.abs(F.col("_lus") - F.col("_rus")) <= delta_us)
        .select(
            key,
            *[f"l_{c}" for c in left_cols],
            *[f"r_{c}" for c in right_cols],
            # exact in float64: microsecond epochs ≪ 2^53
            ((F.col("_rus") - F.col("_lus")) / 1_000_000.0).alias("gap_seconds"),
        )
        # no dedup needed: each right row has exactly ONE bucket, so a
        # pair matches at most one of the left row's three fan-out buckets
    )


def scd2(
    captures: DataFrame,
    key: str,
    ts: str,
    attr_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a capture history:
    collapse consecutive captures with identical tracked attributes into
    versioned validity rows ``(key, version, attrs…, valid_from,
    valid_to, is_current)``.

    The standard dimension-history shape for entity/page state in a KG
    store (Kimball SCD2; Iceberg/Delta ``MERGE`` change capture): a url
    recrawled 40× with 3 distinct states must yield 3 rows, not 40.

    Two window passes over the SAME partitioning (one shuffle, reused —
    the second window's input is already hash-partitioned by ``key``):

    1. change detection: a null-safe struct comparison against
       ``lag(attrs)`` marks version starts (NULL attr values compare
       equal to NULL, not "changed" — ``eqNullSafe``);
    2. validity stitching on the version-start rows only:
       ``valid_to = lead(valid_from)``, open rows get NULL.

    Per-key state is one struct (the lag), so skewed keys cost sort time
    only — no row explosion, no join.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    changed = captures.withColumn(
        "_new",
        ~attrs.eqNullSafe(F.lag(attrs).over(w)) | F.lag(attrs).over(w).isNull(),
    ).filter(F.col("_new"))
    w2 = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    return changed.select(
        key,
        F.row_number().over(w2).cast("long").alias("version"),
        *attr_cols,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def merge_intervals(
    df: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Coalesce overlapping/touching ``[start, end]`` intervals per key
    into maximal islands: ``(key, span_start, span_end, n_intervals)``.

    Gaps-and-islands via the running-max device: an interval opens a new
    island iff its start exceeds the max end of ALL earlier intervals
    (``max(end) over rows unbounded-preceding..-1`` — plain ``lag(end)``
    is wrong when an earlier long interval swallows its successors);
    the island id is the running sum of the open flags.  One window
    partitioning shared by both passes and the final aggregate — a
    single shuffle on ``key`` end-to-end, no self-join (the naive
    overlap formulation is a per-key quadratic theta-join)."""
    w = Window.partitionBy(key).orderBy(F.col(start).asc(), F.col(end).asc())
    prev_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = (prev_max.isNull() | (F.col(start) > prev_max)).cast("long")
    island = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(key, "_island")
        .agg(
            F.min(start).alias("span_start"),
            F.max(end).alias("span_end"),
            F.count("*").alias("n_intervals"),
        )
        .select(
            key,
            F.col("_island").alias("island"),
            "span_start",
            "span_end",
            "n_intervals",
        )
    )


def locf(
    df: DataFrame, key: str, ts: str, value: str, tiebreak: str
) -> DataFrame:
    """Last-observation-carried-forward gap fill: per ``key``, ordered
    by ``(ts, tiebreak)``, replace NULL ``value`` with the most recent
    non-NULL one (``<value>_filled``; leading NULLs stay NULL).

    The sensor/metric backfill primitive (TimescaleDB ``locf``,
    pandas ``ffill``) as one window aggregate —
    ``last(value, ignorenulls)`` over unbounded-preceding rows; no join
    against a "latest state" table, no per-row Python."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        f"{value}_filled", F.last(value, ignorenulls=True).over(w)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Enrich each ``left`` row with the latest ``right`` row of the same
    ``key`` at or before its ``ts``.

    Output: all left columns + ``asof_ts`` + ``asof_<c>`` for each of
    ``right_cols`` (NULL when no right row precedes — LEFT as-of
    semantics).  ``tiebreak`` picks one right row per (key, ts)
    deterministically (max wins)."""
    left_types = dict(left.dtypes)
    other = [c for c in left.columns if c not in (key, ts)]

    r_agg = right.groupBy(key, ts).agg(
        *[F.max_by(c, tiebreak).alias(c) for c in right_cols]
    )
    r_types = dict(r_agg.dtypes)

    r1 = r_agg.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in other],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    l1 = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in other],
        *[F.lit(None).cast(r_types[c]).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE struct per right row, carried atomically: ts and every value
    # column always come from the SAME matched right row, even when that
    # row holds NULL values (per-column last(…, ignorenulls) would skip a
    # NULL and splice in an older row's value — DuckDB ASOF returns the
    # matched row's NULL, and so do we).
    right_struct = F.struct(
        F.col(ts).alias("_ts"), *[F.col(f"_r_{c}").alias(c) for c in right_cols]
    )
    carried = r1.unionByName(l1).select(
        "*",
        F.last(F.when(F.col("_tag") == 0, right_struct), ignorenulls=True)
        .over(w)
        .alias("_asof"),
    )
    return carried.filter(F.col("_tag") == 1).select(
        key,
        ts,
        *other,
        F.col("_asof._ts").alias("asof_ts"),
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def time_weighted_avg(
    df: DataFrame,
    group: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """LOCF time-weighted average of an irregularly sampled series (the
    metric a monitoring/billing rollup computes): each observation
    holds until the next one, so
    twa = Σ v_i·(t_{i+1} − t_i) / (t_last − t_first) per group.

    Exact-integer numerator: values are quantized to cents
    (round(v·100)) and durations to epoch MILLISECONDS (integer
    floor-div both engines), so the per-group sum is order-free integer
    arithmetic and the only floats are the final two divisions.
    ms (not µs) keeps q·dur·n inside int64 at bench scale — documented
    headroom: ~2e4 cents · ~1e10 ms spans · ~1e4 events/group ≈ 2e18.
    One window (lead) and one aggregate, both on the same (group) key —
    a single shuffle.  Single-observation groups have no span: twa = −1
    sentinel + degenerate flag (nullable-double NaN trap, see
    CLAUDE.md).
    """
    e = df.select(
        group,
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) DIV 1000"
        ).alias("tms"),
        F.round(F.col(value) * 100).cast("long").alias("q"),
        tiebreak,
    )
    w = Window.partitionBy(group).orderBy("tms", tiebreak)
    stepped = e.select(
        group,
        "tms",
        "q",
        F.lead("tms").over(w).alias("t_next"),
    )
    agg = stepped.groupBy(group).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("tms").alias("t_first"),
        F.max("tms").alias("t_last"),
        F.sum(F.col("q") * (F.col("t_next") - F.col("tms")))
        .cast("long")
        .alias("num"),
    )
    span = F.col("t_last") - F.col("t_first")
    return agg.select(
        group,
        "n_events",
        span.alias("window_ms"),
        F.round(
            F.when(span > 0, F.col("num") / 100.0 / span).otherwise(
                F.lit(-1.0)
            ),
            6,
        ).alias("twa"),
        (span == 0).alias("degenerate"),
    )


def debounce(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    gap_seconds: int = 600,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands debounce: within each key, events closer than
    ``gap_seconds`` to their predecessor collapse into one burst; the
    burst HEAD survives, annotated with the burst size and span — the
    batch twin of a streaming rate limiter (and the crawl-politeness
    collapse a frontier applies per host).

    One lag window to mark burst starts, one running-sum window for the
    island id (same key+order — Spark plans ONE shuffle and reuses the
    sort), one aggregate.  All arithmetic is integer epoch-ms.
    """
    e = df.select(
        *keys,
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) DIV 1000"
        ).alias("tms"),
        tiebreak,
    )
    w = Window.partitionBy(*keys).orderBy("tms", tiebreak)
    gap_ms = gap_seconds * 1000
    marked = e.select(
        *keys,
        "tms",
        tiebreak,
        F.when(
            F.coalesce(
                F.col("tms") - F.lag("tms").over(w), F.lit(gap_ms + 1)
            )
            > gap_ms,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_start"),
    )
    islands = marked.select(
        *keys,
        "tms",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    return islands.groupBy(*keys, "island_id").agg(
        F.min("tms").alias("head_tms"),
        F.count(F.lit(1)).cast("long").alias("n_collapsed"),
        (F.max("tms") - F.min("tms")).cast("long").alias("span_ms"),
    )


def interpolate_grid(obs: DataFrame, tick_s: int = 3600) -> DataFrame:
    """Linear gap interpolation of an irregular time series onto a
    regular grid — the resampling sibling of ``locf`` (TimescaleDB
    ``interpolate``, pandas ``resample().interpolate()``): per series,
    every tick between the first and last observation gets the straight-
    line value between its surrounding observations.

    ``obs`` must be one row per (series, epoch): ``series`` string,
    ``epoch`` long (seconds), ``vc`` long (value in integer cents — the
    caller quantizes, so the interpolation numerator
    ``pv·(ne−t) + nv·(t−pe)`` is EXACT integer arithmetic and the only
    float is one final division, bit-identical across engines).

    Returns (series, tick, value, kind) — kind 'exact' when an
    observation sits on the tick, 'interp' otherwise; ticks before the
    first / after the last observation are dropped (no extrapolation).

    Plan: grid ticks come from one per-series min/max aggregate +
    ``sequence`` explode (no driver loop); the surrounding observations
    come from the same union + running-window as-of device as
    ``asof_join`` — obs and grid rows interleave once per direction, so
    the whole operator is two window passes over (obs + grid), no
    join of the series against itself."""
    bounds = obs.groupBy("series").agg(
        (((F.min("epoch") + tick_s - 1) / tick_s).cast("long") * tick_s).alias("lo"),
        ((F.max("epoch") / tick_s).cast("long") * tick_s).alias("hi"),
    )
    grid = (
        bounds.filter(F.col("hi") >= F.col("lo"))
        .select(
            "series",
            F.explode(F.expr(f"sequence(lo, hi, {int(tick_s)})")).alias("e"),
        )
    )
    o1 = obs.select("series", F.col("epoch").alias("e"), "vc", F.lit(0).alias("_g"))
    g1 = grid.select(
        "series", "e", F.lit(None).cast("long").alias("vc"), F.lit(1).alias("_g")
    )
    u = o1.unionByName(g1)
    stamp = F.when(F.col("_g") == 0, F.struct(F.col("e").alias("oe"), F.col("vc").alias("ov")))
    w_fwd = (
        Window.partitionBy("series")
        .orderBy(F.col("e").asc(), F.col("_g").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy("series")
        .orderBy(F.col("e").desc(), F.col("_g").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "series",
        "e",
        "_g",
        F.last(stamp, ignorenulls=True).over(w_fwd).alias("p"),
        F.last(stamp, ignorenulls=True).over(w_bwd).alias("n"),
    )
    t, pe, pv, ne, nv = (
        F.col("e"), F.col("p.oe"), F.col("p.ov"), F.col("n.oe"), F.col("n.ov")
    )
    value = F.when(pe == ne, pv / 100.0).otherwise(
        (pv * (ne - t) + nv * (t - pe)) / (100.0 * (ne - pe))
    )
    return (
        carried.filter((F.col("_g") == 1) & pe.isNotNull() & ne.isNotNull())
        .select(
            "series",
            F.col("e").alias("tick"),
            F.round(value, 6).alias("value"),
            F.when(pe == ne, F.lit("exact")).otherwise(F.lit("interp")).alias("kind"),
        )
    )


def ohlc_bars(
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
    series: str = "event_type",
    tiebreak: str = "event_id",
    bucket_s: int = 3600,
) -> DataFrame:
    """OHLC candlestick bars (the TimescaleDB/kdb ``ohlc`` rollup):
    per (series, time bucket) the first/max/min/last value plus count
    and sum.

    Open/close are time-ordered argmin/argmax — computed INSIDE the
    hash aggregate by packing ``(epoch_us, tiebreak, cents)`` into one
    fixed-width lpad string and taking ``min``/``max`` of it, then
    slicing the cents back out.  No per-bucket window sort: hot series
    cost O(rows), the aggregate map-side combines, and the byte-wise
    string order is identical across engines (the anchor_summary /
    funnel argmax device).  Values ride as exact integer cents; the
    caller's precondition (pinned in pytest) is value ≥ 0 so the lpad
    key orders numerically.

    Returns (series, bucket, open_c, high_c, low_c, close_c, n, sum_c)
    with ``bucket`` as epoch seconds.
    """
    us = bucket_s * 1_000_000
    e = events.select(
        F.col(series).alias("series"),
        F.expr(f"unix_micros(cast({ts} as timestamp))").alias("eus"),
        F.col(tiebreak).cast("long").alias("tb"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    ).select(
        "series",
        (F.expr(f"eus DIV {us}") * bucket_s).alias("bucket"),
        F.concat(
            F.lpad(F.col("eus").cast("string"), 20, "0"),
            F.lpad(F.col("tb").cast("string"), 10, "0"),
            # width 12 ≈ $10B in cents; lpad TRUNCATES wider inputs
            # (silently corrupting open/close), so the pad must
            # dominate the value domain, not just the gate fixture's
            F.lpad(F.col("c").cast("string"), 12, "0"),
        ).alias("k"),
        "c",
    )
    cents = lambda col: F.substring(col, 31, 12).cast("long")  # noqa: E731
    return e.groupBy("series", "bucket").agg(
        cents(F.min("k")).alias("open_c"),
        F.max("c").alias("high_c"),
        F.min("c").alias("low_c"),
        cents(F.max("k")).alias("close_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sum_c"),
    )


def cusum_changepoint(
    events: DataFrame,
    ts: str = "ts",
    series: str = "event_type",
    bucket_s: int = 3600,
) -> DataFrame:
    """CUSUM changepoint scan (Page 1954) over per-bucket event counts:
    for each series, the bucket where the cumulative deviation from the
    series mean peaks — the standard level-shift detector for crawl /
    ingest volume anomalies.

    Exact integers throughout: with per-bucket counts c_j on the DENSE
    bucket grid (missing buckets count 0 — a gap IS a level shift),
    n·S_i = n·Σ_{j≤i} c_j − i·T never forms the fractional mean T/n.
    The argmax of |n·S_i| (tie → earliest bucket) is a packed-lpad-key
    ``min`` inside the final hash aggregate — no per-series sort beyond
    the one cumsum window.  Scale shape: the corpus-sized work is the
    bucket-count aggregate (map-side combines); the cumsum window
    partitions by series over the bounded bucket grid; per-series
    (n, T) is a series-sized dimension broadcast back onto the grid.

    Returns (series, n_buckets, total, cusum_peak, cp_bucket, side):
    ``cusum_peak`` = max |n·S_i|, ``cp_bucket`` the bucket (epoch s)
    where it lands, ``side`` +1/-1 for the deviation sign there.
    """
    cnt = (
        events.select(
            F.col(series).alias("series"),
            F.expr(
                f"(unix_micros(cast({ts} as timestamp))"
                f" DIV {bucket_s * 1_000_000}) * {bucket_s}"
            ).alias("bucket"),
        )
        .groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        cnt.groupBy("series")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "series",
            F.explode(F.sequence("lo", "hi", F.lit(bucket_s))).alias("bucket"),
        )
    )
    dense = grid.join(cnt, ["series", "bucket"], "left").select(
        "series", "bucket", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("series").orderBy("bucket")
    walked = dense.select(
        "series",
        "bucket",
        F.sum("c").over(w).alias("pref"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    tot = walked.groupBy("series").agg(
        F.max("i").alias("n_buckets"), F.max("pref").alias("total")
    )
    keyed = walked.join(F.broadcast(tot), "series").select(
        "series",
        "bucket",
        "n_buckets",
        "total",
        (F.col("pref") * F.col("n_buckets") - F.col("i") * F.col("total")).alias("s"),
    )
    key = F.concat(
        F.lpad(
            (F.lit(1_000_000_000_000_000_000) - F.abs("s")).cast("string"), 19, "0"
        ),
        F.lpad(F.col("bucket").cast("string"), 12, "0"),
        F.when(F.col("s") >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return (
        keyed.groupBy("series", "n_buckets", "total")
        .agg(F.min(key).alias("_k"))
        .select(
            "series",
            "n_buckets",
            "total",
            (
                F.lit(1_000_000_000_000_000_000)
                - F.substring("_k", 1, 19).cast("long")
            ).alias("cusum_peak"),
            F.substring("_k", 20, 12).cast("long").alias("cp_bucket"),
            F.when(F.substring("_k", 32, 1) == "1", F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("side"),
        )
    )


def ewma_truncated(
    events: DataFrame,
    ts: str = "ts",
    series: str = "event_type",
    bucket_s: int = 3600,
    window: int = 16,
) -> DataFrame:
    """(series, bucket, ewma_num, ewma) — exponentially weighted moving
    average (α = ½) of per-bucket event counts, TRUNCATED at ``window``
    terms so it stays EXACT: s_i = Σ_{j<window} c_{i−j}·2^{window−1−j}
    is an integer numerator and the only float is the single final
    division by 2^window (the HITS normalize-once device) — no
    compounding float recurrence whose evaluation order could split
    engines.  With α = ½ the dropped tail is < 2^-window of the mass.

    Dense grid (missing buckets are zeros, exactly as cusum_changepoint
    builds it); buckets before the series start contribute implicit
    zeros, so the early ramp matches a zero-padded stream.  Scale
    shape: the corpus-sized work is one bucket-count aggregate; the
    window is materialized as a ``window``-way offset explode on the
    GRID (bounded by time span × window, independent of event count)
    feeding one hash aggregate — a segmented-scan stand-in that keeps
    both engines on identical integer sums.
    """
    cnt = (
        events.select(
            F.col(series).alias("series"),
            F.expr(
                f"(unix_micros(cast({ts} as timestamp))"
                f" DIV {bucket_s * 1_000_000}) * {bucket_s}"
            ).alias("bucket"),
        )
        .groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        cnt.groupBy("series")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "series",
            F.explode(F.sequence("lo", "hi", F.lit(bucket_s))).alias("bucket"),
        )
    )
    # each observation c at bucket b contributes c·2^(window−1−j) to the
    # grid tick b + j·bucket_s for j < window
    contrib = (
        cnt.select(
            "series",
            "bucket",
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("j"),
        )
        .select(
            "series",
            (F.col("bucket") + F.col("j") * bucket_s).alias("bucket"),
            F.expr(f"c * shiftleft(1L, {window - 1} - j)").alias("w"),
        )
    )
    num = contrib.groupBy("series", "bucket").agg(
        F.sum("w").cast("long").alias("ewma_num")
    )
    return (
        grid.join(num, ["series", "bucket"], "left")
        .select(
            "series",
            "bucket",
            F.coalesce("ewma_num", F.lit(0)).cast("long").alias("ewma_num"),
        )
        .withColumn(
            "ewma", F.round(F.col("ewma_num") / F.lit(float(2**window)), 6)
        )
    )


def seasonal_naive_backtest(
    events: DataFrame,
    ts: str = "ts",
    series: str = "event_type",
    bucket_s: int = 3600,
    season: int = 24,
) -> DataFrame:
    """(series, n_eval, sae_seasonal, sae_naive, mae_seasonal,
    mae_naive) — the standard forecasting SANITY BASELINE backtest for
    capacity planning on event volume: seasonal-naive (ŷ_t = y_{t−24h})
    vs persistence (ŷ_t = y_{t−1h}) over the dense hourly count grid,
    scored by mean absolute error on the common eval window
    (t ≥ start + season) so the two MAEs are comparable.

    Absolute errors are exact integer counts summed exactly; each MAE
    is ONE division.  Scale shape: one corpus-sized bucket-count
    aggregate; the two lag lookups are grid self-equi-joins on
    (series, bucket − lag·bucket_s) — the grid is time-span-sized, not
    event-count-sized.
    """
    cnt = (
        events.select(
            F.col(series).alias("series"),
            F.expr(
                f"(unix_micros(cast({ts} as timestamp))"
                f" DIV {bucket_s * 1_000_000}) * {bucket_s}"
            ).alias("bucket"),
        )
        .groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bounds = cnt.groupBy("series").agg(F.min("bucket").alias("lo"),
                                       F.max("bucket").alias("hi"))
    grid = bounds.select(
        "series",
        F.explode(F.sequence("lo", "hi", F.lit(bucket_s))).alias("bucket"),
    )
    dense = (
        grid.join(cnt, ["series", "bucket"], "left")
        .select("series", "bucket", F.coalesce("c", F.lit(0)).alias("c"))
    )
    def lagged(k: int, alias: str) -> DataFrame:
        return dense.select(
            "series",
            (F.col("bucket") + k * bucket_s).alias("bucket"),
            F.col("c").alias(alias),
        )
    ev = (
        dense.join(F.broadcast(bounds.select("series", "lo")), "series")
        .filter(F.col("bucket") >= F.col("lo") + season * bucket_s)
        .join(lagged(season, "f_seasonal"), ["series", "bucket"])
        .join(lagged(1, "f_naive"), ["series", "bucket"])
    )
    return ev.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.abs(F.col("c") - F.col("f_seasonal"))).cast("long")
        .alias("sae_seasonal"),
        F.sum(F.abs(F.col("c") - F.col("f_naive"))).cast("long")
        .alias("sae_naive"),
    ).select(
        "series",
        "n_eval",
        "sae_seasonal",
        "sae_naive",
        F.round(F.col("sae_seasonal") / F.col("n_eval"), 6).alias("mae_seasonal"),
        F.round(F.col("sae_naive") / F.col("n_eval"), 6).alias("mae_naive"),
    )


def autocorrelation(
    events: DataFrame,
    ts: str = "ts",
    bucket_s: int = 3600,
    max_lag: int = 6,
    ndigits: int = 6,
) -> DataFrame:
    """(lag, n_buckets, r) — sample autocorrelation of the event-count
    time series at lags 1..``max_lag``: bucket the stream into
    fixed-width bins, zero-fill the gaps over the [min, max] bucket
    span, and compute  r_k = Σ (xₜ−x̄)(xₜ₊ₖ−x̄) / Σ (xₜ−x̄)² — the ACF a
    seasonality detector reads before choosing the [[q_seasonal_naive]]
    season length (Box & Jenkins; the same series q_interpolate /
    q_seasonal_naive build).

    Scale shape: ONE corpus shuffle — the bucket-count hash aggregate
    with map-side combine; everything after runs on the bucket table
    (span/bucket_s rows): the spine is a sequence explode of the 1-row
    min/max aggregate, the mean/denominator are 1-row broadcasts, and
    the lag numerators are |lags| equi-joins of the small deviation
    table with itself (b₂ = b₁ + k).  Float parity: deviations are
    identical doubles on both engines (mean = exact-int sum / count);
    only the final sums reorder, ~1e-15 relative, far under the
    rounding grain."""
    us = bucket_s * 1_000_000
    b = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / us).cast("long")
    counts = (
        events.select(b.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    rng = counts.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("b"))
    filled = spine.join(counts, "b", "left").select(
        "b", F.coalesce("x", F.lit(0)).cast("double").alias("x")
    )
    m = filled.agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).cast("long").alias("n")
    )
    dev = filled.crossJoin(F.broadcast(m)).select(
        "b", (F.col("x") - F.col("m")).alias("d"), "n"
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lags = dev.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    d2 = dev.select(F.col("b").alias("b2"), F.col("d").alias("d2"))
    return (
        lags.crossJoin(dev)
        .join(d2, F.col("b2") == F.col("b") + F.col("lag"))
        .crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.max("n").cast("long").alias("n_buckets"),
            F.round(F.sum(F.col("d") * F.col("d2")) / F.max("den"), ndigits)
            .alias("r"),
        )
    )


def lateness_audit(
    events: DataFrame, watermark_s: int = 3600, ingest_partition: str | None = None
) -> DataFrame:
    """Watermark-lateness audit (batch replay of one ingest partition):
    ``(event_type, n, n_late, n_dropped, max_lateness_s)`` — for each
    event, lateness = (max event-time seen so far in ARRIVAL order) −
    its own event-time; ``n_dropped`` counts events a streaming job
    with a ``watermark_s`` watermark would discard.  This is the
    number to look at BEFORE picking a watermark: the dropped mass at
    candidate thresholds, per event type.

    Arrival order is event_id (the ingest sequence).  Watermarks are
    tracked PER SOURCE PARTITION (Kafka partition / file) in a real
    stream, so pass that column as ``ingest_partition`` and each
    partition's prefix-max window sorts only its own rows; the
    ``None`` default (single global sequence) replays one ingest
    partition and funnels the table through one sort — gate-scale
    only.  Exact integer micros throughout, one final per-type
    aggregate either way.
    """
    us = F.expr("unix_micros(cast(ts as timestamp))")
    w = (
        Window.partitionBy(ingest_partition)
        if ingest_partition is not None
        else Window.partitionBy()
    )
    w = w.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    late = (F.max(us).over(w) - us).alias("late_us")
    base = events.select("event_type", late)
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("late_us") > 0).cast("long"))
        .cast("long")
        .alias("n_late"),
        F.sum(
            (F.col("late_us") > watermark_s * 1000000).cast("long")
        )
        .cast("long")
        .alias("n_dropped"),
        F.expr("max(late_us) DIV 1000000").alias("max_lateness_s"),
    )


def allen_relations(events: DataFrame) -> DataFrame:
    """Allen's interval algebra (Allen CACM'83) over per-(user,
    event-type) activity intervals: each pair of intervals of the same
    user is classified into exactly one of the 13 relations —
    ``before/after``, ``meets/met_by``, ``overlaps/overlapped_by``,
    ``starts/started_by``, ``during/contains``, ``finishes/
    finished_by``, ``equals`` — the temporal-KG primitive for fact
    validity reasoning ("was X's role DURING Y's tenure?").

    Intervals are [min ts, max ts] per (user_id, event_type); pairs
    are ordered ``type_a < type_b`` so each unordered pair appears
    once but BOTH directions of every asymmetric relation still occur.
    The CASE ladder tests the two equality relations first, then the
    four disjoint/touching cases, then containment — mutually
    exclusive and total, same ladder in the SQL twin.

    Scale shape: one (user, type) hash aggregate reduces the raw
    events to a user×type-sized table, then a self-equi-join on
    user_id with bounded fan-out (≤ C(|types|, 2) pairs per user —
    the type vocabulary is small by construction).  No window, no
    global sort; microsecond timestamps make boundary-equality exact
    on both engines.
    """
    iv = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    a = iv.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = iv.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    p = a.join(b, "user_id").filter(F.col("type_a") < F.col("type_b"))
    sa, ea, sb, eb = (F.col(c) for c in ("sa", "ea", "sb", "eb"))
    rel = (
        F.when((sa == sb) & (ea == eb), "equals")
        .when(ea < sb, "before")
        .when(eb < sa, "after")
        .when(ea == sb, "meets")
        .when(eb == sa, "met_by")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb) & (ea > eb), "started_by")
        .when((ea == eb) & (sa > sb), "finishes")
        .when((ea == eb) & (sa < sb), "finished_by")
        .when((sa > sb) & (ea < eb), "during")
        .when((sa < sb) & (ea > eb), "contains")
        .when((sa < sb) & (sb < ea) & (ea < eb), "overlaps")
        .otherwise("overlapped_by")
    )
    return p.select(
        "user_id", "type_a", "type_b", rel.alias("relation")
    )


def pacf_from_acf(
    acf: DataFrame, max_lag: int = 6, ndigits: int = 6
) -> DataFrame:
    """(lag, pacf) — partial autocorrelation function by the Durbin–
    Levinson recursion (Box & Jenkins' AR-order identification tool:
    the ACF says "how much memory", the PACF says "how many AR terms")
    over an :func:`autocorrelation` output ``(lag, r)``.

    The recursion φ_kk = (r_k − Σ_j φ_{k−1,j}·r_{k−j}) /
    (1 − Σ_j φ_{k−1,j}·r_j), φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j} is
    UNROLLED over the fixed ``max_lag`` as one column-expression chain
    on the 1-row pivoted ACF — no iteration state, no UDF; the inputs
    are the ROUNDED r's (identical doubles on both engines by the ACF
    contract), every level is a fixed float tree in pinned
    left-associated order, and the SQL twin generates the same chain
    textually.  Degenerate 1 − Σφr = 0 denominators yield φ_kk = 0
    lazily (ANSI-safe).  Everything is dimension-sized (one row wide,
    ``max_lag`` columns deep).
    """
    row = acf.groupBy().agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("r"))).alias(f"r{k}")
            for k in range(1, max_lag + 1)
        ]
    )
    cur = row.select("*", F.col("r1").alias("p1_1"))
    for k in range(2, max_lag + 1):
        num = None
        den = None
        for j in range(1, k):
            tn = F.col(f"p{k-1}_{j}") * F.col(f"r{k-j}")
            td = F.col(f"p{k-1}_{j}") * F.col(f"r{j}")
            num = tn if num is None else num + tn
            den = td if den is None else den + td
        num = F.col(f"r{k}") - num
        den = F.lit(1.0) - den
        phi = F.when(den != 0, num / den).otherwise(F.lit(0.0))
        new = [phi.alias(f"p{k}_{k}")]
        for j in range(1, k):
            new.append(
                (F.col(f"p{k-1}_{j}") - phi * F.col(f"p{k-1}_{k-j}"))
                .alias(f"p{k}_{j}")
            )
        cur = cur.select("*", *new)
    structs = [
        F.struct(
            F.lit(k).cast("long").alias("lag"),
            F.round(F.col(f"p{k}_{k}"), ndigits).alias("pacf"),
        )
        for k in range(1, max_lag + 1)
    ]
    return cur.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def ljung_box(
    acf: DataFrame, n_obs_col: str = "n_buckets", ndigits: int = 6
) -> DataFrame:
    """One-row Ljung–Box portmanteau statistic (Ljung & Box,
    Biometrika 1978) over an :func:`autocorrelation` output:
    Q = n(n+2)·Σ_k r_k²/(n−k), df = max lag — the "is anything left in
    the residuals" white-noise diagnostic that closes the Box–Jenkins
    triple (q_acf identifies, q_pacf orders, this one tests).

    Each lag's r_k²/(n−k) term is a fixed float chain over the ROUNDED
    r (identical doubles both engines) micro-quantized at 10⁹ and
    integer-summed (the B³ device); Q is one final multiply of exact
    factors.  Output ``(n, df, q_stat)``; NULL when n ≤ max lag.
    """
    j = acf.select(
        F.col(n_obs_col).cast("long").alias("n"),
        "lag",
        F.round(
            F.lit(1000000000.0)
            * (F.col("r") * F.col("r"))
            / (F.col(n_obs_col) - F.col("lag")).cast("double"),
            0,
        )
        .cast("long")
        .alias("tq"),
    ).where(F.col("n") > F.col("lag"))
    g = j.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tq").cast("long").alias("sq"),
    )
    q = (
        F.col("n").cast("double")
        * (F.col("n") + F.lit(2)).cast("double")
        * (F.col("sq").cast("double") / F.lit(1000000000.0))
    )
    return g.select("n", "df", F.round(q, ndigits).alias("q_stat"))


def hurst_rs(
    events: DataFrame,
    window_sizes: tuple[int, ...] = (5, 10, 15, 30),
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    & Wallis 1969) of the daily-mean series: split the day series into
    full windows of each size n, compute each window's R/S (range of
    cumulative mean-deviations over the population std), average per
    n, and fit ln(R/S) on ln(n) — one row ``(n_sizes, n_windows,
    hurst)``.  H ≈ 0.5 = random walk, > 0.5 = persistent trends, < 0.5
    = mean-reverting; the long-memory readout [[q_acf]]'s short lags
    can't see.

    Exactness: daily means are fixed-point integers (the sax_symbols
    device); within a window, n·cumdev_j = n·Σ_{k≤j}x − (j+1)·Σx is
    EXACT BIGINT, so R·n = max−min of integers, and n²·S² = n·Σx² −
    (Σx)² is one exact integer — R/S = Rn/√D with ONE sqrt of an
    integer per window.  Per-n means quantize each window's R/S at 10⁹
    (integer Σ); the final log-log fit micro-quantizes ln's (the zipf
    device) so the OLS slope is a ratio of exact integer moments.
    Constant windows (D = 0) are dropped, documented.

    Scale: the stream collapses to the day table once; everything
    after runs on days × |window_sizes| rows.
    """
    spark = events.sparkSession
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(
            F.sum("cents").cast("long").alias("dc"),
            F.count(F.lit(1)).cast("long").alias("dn"),
        )
        .select("d", F.expr("(dc * 1000) DIV dn").cast("long").alias("x"))
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.expr("datediff(d, d0)").cast("long").alias("i"), "x"
    )
    ns = spark.createDataFrame(
        [(int(n),) for n in window_sizes], "n long"
    )
    rows = idx.crossJoin(F.broadcast(ns)).select(
        "n",
        F.expr("i DIV n").cast("long").alias("chunk"),
        (F.col("i") % F.col("n")).alias("j"),
        "x",
    )
    sums = rows.groupBy("n", "chunk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).where(F.col("cnt") == F.col("n"))
    w = Window.partitionBy("n", "chunk").orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rows.select(
        "n", "chunk", "j", F.sum("x").over(w).cast("long").alias("cum")
    )
    dev = cum.join(sums, ["n", "chunk"]).select(
        "n",
        "chunk",
        "sx",
        "sxx",
        (F.col("n") * F.col("cum") - (F.col("j") + 1) * F.col("sx"))
        .cast("long")
        .alias("cd"),
    )
    per_chunk = dev.groupBy("n", "chunk").agg(
        F.max("sx").alias("sx"),
        F.max("sxx").alias("sxx"),
        (F.max("cd") - F.min("cd")).cast("long").alias("rn"),
    )
    dcol = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("long")
    # lazy guard INSIDE the projection: the filter below is not
    # guaranteed to evaluate first, and a constant window (D = 0)
    # would push NaN/Inf into the ANSI long cast
    rs_q = per_chunk.select(
        "n",
        dcol.alias("dd"),
        F.when(
            dcol > 0,
            F.round(
                F.lit(1000000000.0)
                * F.col("rn").cast("double")
                / F.sqrt(dcol.cast("double")),
                0,
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("long")
        .alias("rsq"),
    ).where(F.col("dd") > 0)
    per_n = rs_q.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("rsq").cast("long").alias("srs"),
    )
    pts = per_n.select(
        "n",
        "cnt",
        F.round(F.log(F.col("n").cast("double")) * F.lit(1e6), 0)
        .cast("long")
        .alias("xq"),
        F.round(
            F.log(
                F.col("srs").cast("double")
                / (F.col("cnt").cast("double") * F.lit(1000000000.0))
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("yq"),
    )
    g = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("cnt").cast("long").alias("n_windows"),
        F.sum("xq").cast("long").alias("sxp"),
        F.sum("yq").cast("long").alias("syp"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxxp"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxyp"),
    )
    den = F.col("k") * F.col("sxxp") - F.col("sxp") * F.col("sxp")
    num = F.col("k") * F.col("sxyp") - F.col("sxp") * F.col("syp")
    hurst = F.when(
        den != 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col("k").alias("n_sizes"),
        # coalesce: an all-constant series yields zero points and a
        # NULL sum — the output contract is NULL-free (pandas gate)
        F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
        F.round(hurst, ndigits).alias("hurst"),
    )


def yule_walker_ar2(acf: DataFrame, ndigits: int = 6) -> DataFrame:
    """Closed-form Yule–Walker AR(2) fit from an
    :func:`autocorrelation` output — one row ``(phi1, phi2,
    resid_var_ratio)`` with φ₁ = r₁(1−r₂)/(1−r₁²),
    φ₂ = (r₂−r₁²)/(1−r₁²) and the residual-variance ratio
    σ²/γ₀ = 1 − φ₁r₁ − φ₂r₂ — the two-parameter memory model the
    [[q_pacf]] order check usually lands on (PACF says "2 AR terms",
    this fits them without any iterative estimation).

    Inputs are the ROUNDED r₁, r₂ (identical doubles both engines);
    the whole fit is a fixed float tree, NULL-free: a degenerate
    1−r₁² = 0 (perfect lag-1 correlation) yields zeros lazily.
    """
    row = acf.groupBy().agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
    )
    den = F.lit(1.0) - F.col("r1") * F.col("r1")
    phi1 = F.when(
        den != 0,
        F.col("r1") * (F.lit(1.0) - F.col("r2")) / den,
    ).otherwise(F.lit(0.0))
    phi2 = F.when(
        den != 0,
        (F.col("r2") - F.col("r1") * F.col("r1")) / den,
    ).otherwise(F.lit(0.0))
    rvr = F.lit(1.0) - phi1 * F.col("r1") - phi2 * F.col("r2")
    return row.select(
        F.round(phi1, ndigits).alias("phi1"),
        F.round(phi2, ndigits).alias("phi2"),
        F.round(rvr, ndigits).alias("resid_var_ratio"),
    )
