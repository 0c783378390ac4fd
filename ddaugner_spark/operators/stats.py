"""Table/column statistics and model-free scoring: ANALYZE-style
column profiles, robust (median/MAD) outlier flags, and fixed-weight
logistic quality inference.

Engine additions beyond the reference (the catalog/quality side of a
100 TB corpus store): the optimizer-stats profile every warehouse
collects (``ANALYZE TABLE``), the robust per-group outlier screen a
quality dashboard runs on document lengths, and the linear-model
inference step of a fastText/CCNet-style quality classifier — all as
single-pass aggregates / map-only expressions, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style per-column profile: ``(column, n_rows, n_null,
    ndv, min_s, max_s)`` — row count, NULL count, exact distinct count,
    lexical/numeric min and max rendered as strings.

    One aggregate pass producing a single row of per-column structs,
    exploded to one output row per column.  The multiple exact
    ``count(distinct)``s plan as Spark's Expand (one scan, rows ×
    |cols| map-side); at production scale swap ``countDistinct`` for
    ``approx_count_distinct`` (HLL, no Expand) — exact here so the
    DuckDB oracle can replay it.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_n_{c}").cast("long").alias("n_rows"),
            (F.col(f"_n_{c}") - F.col(f"_nn_{c}")).cast("long").alias("n_null"),
            F.col(f"_ndv_{c}").cast("long").alias("ndv"),
            F.col(f"_min_{c}").alias("min_s"),
            F.col(f"_max_{c}").alias("max_s"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def mad_outliers(
    df: DataFrame, group: str, value: str, z_thresh: float = 3.5
) -> DataFrame:
    """Robust per-group outlier screen (Iglewicz–Hoaglin modified
    z-score): ``robust_z = 0.6745 · (x − median) / MAD`` with
    ``MAD = median(|x − median|)``; flag ``|z| > z_thresh``.

    Median/MAD, not mean/stddev, because corpus length distributions
    are heavy-tailed — one 10 MB page should not move the screen.  Two
    group-sized aggregate passes (exact ``percentile``; the group-stat
    tables are key-sized and broadcast back), zero row explosion.
    ``MAD = 0`` (constant group) yields ``z = 0``: nothing in a
    constant group is an outlier.
    """
    v = F.col(value).cast("double")
    med = df.groupBy(group).agg(F.percentile(v, 0.5).alias("med"))
    with_med = df.join(F.broadcast(med), group)
    mad = (
        with_med.groupBy(group)
        .agg(F.percentile(F.abs(v - F.col("med")), 0.5).alias("mad"))
    )
    z = F.when(F.col("mad") == 0.0, F.lit(0.0)).otherwise(
        0.6745 * (v - F.col("med")) / F.col("mad")
    )
    return (
        with_med.join(F.broadcast(mad), group)
        .withColumn("robust_z", F.round(z, 6))
        .withColumn("is_outlier", F.abs(F.col("robust_z")) > z_thresh)
    )


def filter_stack(
    docs: DataFrame,
    stopwords: list[str],
    min_chars: int = 100,
    max_chars: int = 500,
    min_ttr: float = 0.35,
    min_stop: float = 0.02,
) -> DataFrame:
    """CCNet/RefinedWeb-style quality FILTER STACK with attributed
    drop reasons: every document gets ``(n_chars, ttr, stop_ratio,
    reason, keep)`` where ``reason`` is the FIRST failing rule in the
    fixed order short → long → low_ttr → low_stopword → duplicate →
    keep.  Attribution (not just a boolean) is what makes a 100 TB
    filtering run debuggable — the per-reason drop-rate table is the
    dashboard that catches a rule gone wrong before a trillion tokens
    are discarded.

    Content rules are map-only column arithmetic; the duplicate rule
    is one md5-keyed aggregate joined back (keeper = min doc_id), the
    exact-dedup shuffle the stack would pay anyway.  No per-row
    Python; the stopword membership compiles to an OR chain inside the
    lambda (no computed-array reference in the body)."""
    from functools import reduce

    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(text, " ")
    nc = F.length(text)
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    stop_ratio = (
        F.size(
            F.filter(
                toks,
                lambda x: reduce(
                    lambda a, b: a | b, [x == F.lit(s) for s in stopwords]
                ),
            )
        )
        / F.size(toks)
    )
    feat = docs.select(
        "doc_id",
        nc.cast("long").alias("n_chars"),
        ttr.alias("ttr"),
        stop_ratio.alias("stop_ratio"),
        F.md5(text).alias("h"),
    )
    canon = feat.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    reason = (
        F.when(F.col("n_chars") < min_chars, F.lit("short"))
        .when(F.col("n_chars") > max_chars, F.lit("long"))
        .when(F.col("ttr") < min_ttr, F.lit("low_ttr"))
        .when(F.col("stop_ratio") < min_stop, F.lit("low_stopword"))
        .when(F.col("doc_id") != F.col("keeper"), F.lit("duplicate"))
        .otherwise(F.lit("keep"))
    )
    return feat.join(canon, "h").select(
        "doc_id",
        "n_chars",
        F.round("ttr", 6).alias("ttr"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


def logistic_score(
    df: DataFrame, weights: dict[str, float], bias: float
) -> Column:
    """Fixed-weight logistic-regression inference ``σ(w·x + b)`` over
    feature COLUMNS of ``df`` — the scoring half of a CCNet/fastText-
    style quality classifier once training (out of scope, SURVEY §3.1)
    has produced the weights.  Pure column arithmetic: map-only,
    whole-stage codegen, replays exactly in SQL.
    """
    z = F.lit(float(bias))
    for c, w in weights.items():
        z = z + F.lit(float(w)) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def spearman_corr(
    df: DataFrame, x: str, y: str, ndigits: int = 6
) -> DataFrame:
    """One-row ``(n, rho)`` — Spearman rank correlation of two
    integer-valued columns, ties → average ranks (the standard
    fractional-rank estimator; the monotone-association readout for
    quality-signal vs engagement style screens where Pearson is
    distorted by heavy tails).

    Exactness: DOUBLED average ranks are integers —
    2·avgrank(v) = 2·|{u < v}| + cnt(v) + 1 — and the constant factor
    cancels in the correlation, so rho reduces to the exact-sums
    Pearson device (graph.degree_assortativity): Σr accumulates in
    decimal(38,0), one double cast per sum, a fixed-order float chain.
    Degenerate (zero variance) ⇒ the -9.9 NULL sentinel.

    Scale shape: each column's rank map is derived from its
    VALUE-FREQUENCY table (distinct-value-sized, not row-sized); the
    cumulative window runs over that dimension, and the map joins back
    onto the rows by value — two row-sized hash joins, no row-sized
    sort anywhere.
    """
    base = df.select(
        F.col(x).cast("long").alias("x"), F.col(y).cast("long").alias("y")
    )

    def rank_map(col: str) -> DataFrame:
        freq = base.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col)
        return freq.select(
            col,
            (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1)
            .cast("long")
            .alias(f"r_{col}"),
        )

    j = base.join(rank_map("x"), "x").join(rank_map("y"), "y")
    xd = F.col("r_x").cast("decimal(38,0)")
    yd = F.col("r_y").cast("decimal(38,0)")
    g = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when((vx > 0) & (vy > 0), num / F.sqrt(vx) / F.sqrt(vy))
    return g.select(
        "n", F.coalesce(F.round(rho, ndigits), F.lit(-9.9)).alias("rho")
    )


def group_order_stats(
    events: DataFrame,
    series: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """(series, n, median2_c, median, p90_c) — EXACT per-group order
    statistics (median with the even-n half-point, p90) over integer
    cents, the ground-truth counterpart to the mergeable
    quantile_sketch: median·2 = os(⌈n/2⌉) + os(⌈(n+1)/2⌉) stays an
    integer, p90 = os(⌈0.9·n⌉), and the only float is ONE division
    rendering the median in currency units.

    Scale shape: the row-sized work is one (series, cents) frequency
    aggregate (map-side combined); the cumulative window and the
    order-statistic selection run on the VALUE-FREQUENCY table —
    distinct-value-sized, the spearman_corr rank-map device — and the
    k-targets join back from a series-sized (broadcast) count table.
    One conditional-min aggregate reads off all three order statistics.
    """
    base = events.select(
        F.col(series).alias("series"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    )
    freq = base.groupBy("series", "c").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    w = Window.partitionBy("series").orderBy("c")
    cum = freq.select("series", "c", F.sum("f").over(w).alias("cum"))
    n = base.groupBy("series").agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = cum.join(F.broadcast(n), "series").select(
        "series",
        "c",
        "cum",
        "n",
        F.expr("(n + 1) DIV 2").alias("k1"),
        F.expr("(n + 2) DIV 2").alias("k2"),
        F.expr("(9 * n + 9) DIV 10").alias("k90"),
    )
    out = j.groupBy("series", "n").agg(
        (
            F.min(F.when(F.col("cum") >= F.col("k1"), F.col("c")))
            + F.min(F.when(F.col("cum") >= F.col("k2"), F.col("c")))
        ).alias("median2_c"),
        F.min(F.when(F.col("cum") >= F.col("k90"), F.col("c"))).alias("p90_c"),
    )
    return out.select(
        "series",
        "n",
        "median2_c",
        F.round(F.col("median2_c") / 200.0, 6).alias("median"),
        "p90_c",
    )
