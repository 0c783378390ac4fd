"""Distributed closed-form regression from exact integer sums.

Analytics engines ship regr_slope/regr_intercept as one-pass
aggregates; at 100 TB the hazard is FLOAT SUMMATION ORDER — a
`sum(x*y)` over doubles returns a partition-order-dependent value, so
two runs (or the engine and its oracle) disagree in the low bits and
every downstream rounding can flip.  The device here is the repo-wide
integer-determinism rule applied to regression: ingest the measures as
FIXED-POINT integers (cents, units), accumulate the five sufficient
statistics (n, Σx, Σy, Σx², Σxy) EXACTLY — Spark ingests values as
decimal(19,0) so products land in decimal(38,0) and sums accumulate
there; DuckDB sums in HUGEINT — both order-insensitive — and convert
each exact sum to double ONCE (IEEE nearest, value-determined) before
the constant number of closed-form float ops.  The result is
bit-reproducible under any partitioning, any engine.

Input-domain bound (NOT unconditional overflow-freedom): exactness
holds while Σ|x·y| and Σx² stay under 10³⁸ (decimal(38,0)) / 1.7·10³⁸
(HUGEINT) — e.g. fixed-point magnitudes up to 10¹⁴ across 10¹⁰ rows.
Past it Spark's decimal sum NULLs (non-ANSI) while DuckDB raises —
divergent failure modes, so ingest at a coarser fixed-point scale
before approaching the bound.

One hash aggregate with map-side combine; output is group-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols_fit(
    df: DataFrame,
    x: str,
    y: str,
    keys: list[str],
    ndigits: int = 6,
) -> DataFrame:
    """Per-group simple OLS y = intercept + slope·x over INTEGER
    columns ``x``/``y`` (fixed-point ingestion is the caller's job):
    ``(keys…, n, slope, intercept)`` with

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Groups with zero x-variance emit NULL slope/intercept (vertical
    fit is undefined), matching SQL regr_slope semantics.
    """
    xd = F.col(x).cast("decimal(19,0)")
    yd = F.col(y).cast("decimal(19,0)")
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    nn = F.col("n").cast("double")
    denom = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0.0,
        (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    intercept = F.when(
        denom != 0.0, (F.col("sy") - slope * F.col("sx")) / nn
    )
    return g.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.round(slope, ndigits).alias("slope"),
        F.round(intercept, ndigits).alias("intercept"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the ``value_col``
    distributions of two groups: D = max_v |F_a(v) − F_b(v)| over the
    pooled value support, plus the smallest value attaining it — the
    nonparametric drift detector for "did this segment's distribution
    change".  One row: (n_a, n_b, d_stat, at_value).

    ECDF differences are exact-integer cumulative counts divided once
    each — no float summation; the argmax picks max(struct(diff,
    -value)) so ties resolve to the smallest value identically in both
    engines.  Shape: one (value) conditional aggregate (support-sized),
    one cumulative window over that support, one global max."""
    va = (F.col(group_col) == group_a).cast("long")
    vb = (F.col(group_col) == group_b).cast("long")
    # ECDF over non-null values only — NULL ordering differs between
    # engines' windows (Spark NULLS FIRST asc, DuckDB NULLS LAST)
    df = df.filter(F.col(value_col).isNotNull())
    per_v = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.sum(va).alias("ca"), F.sum(vb).alias("cb"))
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy("v").rowsBetween(_W.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    na = df.filter(F.col(group_col) == group_a).count()
    nb = df.filter(F.col(group_col) == group_b).count()
    diff = F.abs(
        F.col("cum_a").cast("double") / F.lit(float(na))
        - F.col("cum_b").cast("double") / F.lit(float(nb))
    )
    best = cum.agg(
        F.max(F.struct(diff.alias("d"), (-F.col("v")).alias("nv"))).alias("b")
    )
    return best.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round(F.col("b.d"), ndigits).alias("d_stat"),
        (-F.col("b.nv")).alias("at_value"),
    )


def gini_coefficient(
    df: DataFrame, key_col: str, ndigits: int = 6
) -> DataFrame:
    """Gini coefficient of the per-key row-count distribution,

        G = 2·Σᵢ i·xᵢ / (n·Σ xᵢ) − (n+1)/n

    over counts xᵢ sorted ascending with rank i (ties broken by key for
    a cross-engine total order) — the concentration metric behind crawl
    budget and skew dashboards (G → 1: a few keys own the traffic).
    One per-key count aggregate, one rank window over the KEY-sized
    table, exact-integer Σ i·xᵢ in decimal, then a fixed float chain.
    Single row: (n_keys, total, gini)."""
    from pyspark.sql import Window as _W

    per = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = _W.orderBy(F.col("x").asc(), F.col("k").asc())
    ranked = per.withColumn("i", F.row_number().over(w))
    g = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("x").cast("long").alias("total"),
        F.sum(
            (F.col("i").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        ).cast("double").alias("swx"),
    )
    n = F.col("n_keys").cast("double")
    gini = (
        F.lit(2.0) * F.col("swx") / (n * F.col("total").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return g.select(
        "n_keys", "total", F.round(gini, ndigits).alias("gini")
    )


def theil_sen_hourly(
    events: DataFrame, bucket_s: int = 3600, ndigits: int = 6
) -> DataFrame:
    """Theil-Sen robust trend of the hourly event-count series: one row
    ``(n_buckets, n_pairs, slope, intercept)`` — the median of all
    pairwise bucket slopes and the median residual intercept.  The
    trend readout OLS gets wrong whenever one outage hour or crawl
    burst leverages the fit; Theil-Sen tolerates ~29% arbitrary
    corruption.

    All-pairs is deliberate and scale-safe: the quadratic blowup is in
    the BUCKET count (time-bounded — a year is 8 760 hourly buckets →
    38M slim pairs), never in the event rows; the events contribute
    one bucket-count aggregate.  Slopes are single divisions of exact
    integers (identical doubles on both engines), medians are picked
    by the order-statistic window with full (slope, b1, b2) tiebreak,
    and the even-n midpoint averages two identical doubles — exact.
    Zero-count hours are spine-filled (a gap is data, not absence).
    """
    counts = events.groupBy(
        F.expr(
            f"unix_micros(cast(ts as timestamp)) DIV {bucket_s * 1000000}"
        ).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = counts.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b")
    )
    filled = spine.join(counts, "b", "left").select(
        "b", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    l = filled.select(F.col("b").alias("b1"), F.col("y").alias("y1"))
    r = filled.select(F.col("b").alias("b2"), F.col("y").alias("y2"))
    pairs = l.join(r, F.col("b1") < F.col("b2")).select(
        "b1",
        "b2",
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("b2") - F.col("b1")).cast("double")
        ).alias("s"),
    )
    w = Window.orderBy("s", "b1", "b2")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    nb = filled.agg(F.count(F.lit(1)).cast("long").alias("n_buckets"))
    np_ = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    med_s = (
        ranked.crossJoin(F.broadcast(np_))
        .agg(
            (
                (
                    F.min(
                        F.when(
                            F.col("rn")
                            == F.expr("(n_pairs + 1) DIV 2"),
                            F.col("s"),
                        )
                    )
                    + F.min(
                        F.when(
                            F.col("rn")
                            == F.expr("(n_pairs + 2) DIV 2"),
                            F.col("s"),
                        )
                    )
                )
                / 2.0
            ).alias("slope_raw")
        )
    )
    resid = filled.crossJoin(F.broadcast(med_s)).select(
        "b",
        (F.col("y") - F.col("slope_raw") * F.col("b")).alias("r"),
    )
    wr = Window.orderBy("r", "b")
    rr = resid.withColumn("rn", F.row_number().over(wr))
    med_i = (
        rr.crossJoin(F.broadcast(nb))
        .agg(
            (
                (
                    F.min(
                        F.when(
                            F.col("rn")
                            == F.expr("(n_buckets + 1) DIV 2"),
                            F.col("r"),
                        )
                    )
                    + F.min(
                        F.when(
                            F.col("rn")
                            == F.expr("(n_buckets + 2) DIV 2"),
                            F.col("r"),
                        )
                    )
                )
                / 2.0
            ).alias("intercept_raw")
        )
    )
    return (
        nb.crossJoin(np_)
        .crossJoin(med_s)
        .crossJoin(med_i)
        .select(
            "n_buckets",
            "n_pairs",
            F.round("slope_raw", ndigits).alias("slope"),
            F.round("intercept_raw", ndigits).alias("intercept"),
        )
    )
