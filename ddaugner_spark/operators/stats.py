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

from pyspark.sql import Column, DataFrame
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
