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

from pyspark.sql import DataFrame
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
