"""Skyline (Pareto front) — the multi-criteria "best tradeoffs"
operator (Börzsönyi et al. ICDE'01): rows not strictly dominated by
any other row, where s dominates r iff s ≥ r on every dimension and
s > r on at least one (all dimensions maximized; negate a column to
minimize it).

Scale shape — the grid-pruned two-phase plan (the distributed-skyline
literature's standard shape, e.g. Mullesgaard et al. EDBT'14):

1. one aggregate for global per-dim min/max (a scalar row, inlined as
   literals — the k-means-centroid discipline, no driver loop);
2. bucket every row into a ``grid^d`` lattice cell (one corpus pass,
   map-only) and aggregate the non-empty cell census (tiny);
3. CELL-LEVEL pruning on the census alone: cell B dies if some
   non-empty cell A satisfies ``A_d ≥ B_d + 1`` on every dim and
   ``A_d ≥ B_d + 2`` on at least one — then any A-point weakly beats
   any B-point everywhere and strictly beats it somewhere, so every
   B-point is certainly dominated.  The census self-join is
   ``(non-empty cells)²`` — bounded by ``grid^d``, never by rows;
4. rows in surviving cells (the Pareto band) go through the exact
   dominance anti-join.  Correctness of pruning needs only dominance
   transitivity: a skyline point is never in a pruned cell, and any
   dominator chain ends in the skyline, so survivors-vs-survivors
   decides the global skyline exactly.

The final anti-join is quadratic IN THE BAND — the band is the
grid-diagonal shell (≈ grid^(d−1) cells of the lattice), which is the
point of phase 3: the corpus-sized table is touched twice (stats +
bucketing), never self-joined.

The DuckDB oracle is the definition: NOT EXISTS a dominating row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(df: DataFrame, dims: list[str], grid: int = 16) -> DataFrame:
    """Pareto front of ``df`` maximizing every column in ``dims``
    (numeric; negate to minimize).  Returns the input rows that are
    not strictly dominated, original columns preserved.
    """
    stats = df.agg(
        *[F.min(d).alias(f"mn_{d}") for d in dims],
        *[F.max(d).alias(f"mx_{d}") for d in dims],
    ).first()

    def bucket(d: str):
        lo, hi = stats[f"mn_{d}"], stats[f"mx_{d}"]
        if lo is None or hi is None or hi == lo:
            return F.lit(0)
        return F.least(
            F.lit(grid - 1),
            F.floor(
                (F.col(d) - F.lit(lo)) / F.lit((hi - lo) / grid)
            ).cast("int"),
        )

    bcols = [f"_b{i}" for i in range(len(dims))]
    rows = df.select(
        "*", *[bucket(d).alias(b) for d, b in zip(dims, bcols)]
    )
    cells = rows.groupBy(*bcols).agg(F.count(F.lit(1)).alias("_n"))

    a = cells.select(*[F.col(b).alias(f"a{b}") for b in bcols])
    weak = [F.col(f"a{b}") >= F.col(b) + 1 for b in bcols]
    strict = [F.col(f"a{b}") >= F.col(b) + 2 for b in bcols]
    cond = weak[0]
    for c in weak[1:]:
        cond = cond & c
    scond = strict[0]
    for c in strict[1:]:
        scond = scond | c
    pruned = cells.join(F.broadcast(a), cond & scond, "left_semi")
    alive = cells.join(pruned, bcols, "left_anti").select(*bcols)

    band = rows.join(F.broadcast(alive), bcols).drop(*bcols)
    dom = band.select(*[F.col(d).alias(f"s_{d}") for d in dims])
    geq = [F.col(f"s_{d}") >= F.col(d) for d in dims]
    gt = [F.col(f"s_{d}") > F.col(d) for d in dims]
    jcond = geq[0]
    for c in geq[1:]:
        jcond = jcond & c
    jstrict = gt[0]
    for c in gt[1:]:
        jstrict = jstrict | c
    return band.join(F.broadcast(dom), jcond & jstrict, "left_anti")
