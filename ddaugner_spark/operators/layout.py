"""Data-layout keys: Z-order (Morton) interleaving for multi-column
locality.

A 100 TB table answers range predicates on MULTIPLE columns only if
rows close in the query space are close in the file layout — the
Z-order curve (bit-interleaving of the participating columns) is the
standard device (Delta/Iceberg OPTIMIZE ZORDER, Hudi clustering): sort
or bucket by the Morton key once and every participating column's
range predicate prunes ~√-proportionally instead of one column winning
and the rest scanning everything.

The key itself is pure bit arithmetic — shifts, masks, ORs — so it
computes map-side inside whole-stage codegen and replays exactly in
the SQL twin (two's-complement shifts are engine-identical on
non-negative inputs, which the mask guarantees).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton code of ``cols``: bit b of column i lands at output bit
    b·len(cols) + i.  Each input is masked to its low ``bits`` bits
    first (callers quantize to that range); with n·bits ≤ 63 the result
    fits a signed long."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("zorder key would overflow a signed long")
    mask = (1 << bits) - 1
    parts = []
    for i, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, buckets: int = 64
) -> DataFrame:
    """df + (zorder, zbucket): the Morton key over ``cols`` and its
    top-log2(buckets) bucket — the clustering/sort key a writer would
    range-partition by.  Map-only."""
    z = zorder_key([F.col(c) for c in cols], bits=bits)
    shift = len(cols) * bits - max(1, (buckets - 1).bit_length())
    return df.withColumns(
        {
            "zorder": z,
            "zbucket": F.shiftright(z, shift).cast("int"),
        }
    )


def zone_maps(df: DataFrame, file_col: str, stat_cols: list[str]) -> DataFrame:
    """Per-file min/max zone maps: ``(file, n_rows, <c>_min, <c>_max …)``
    — the data-skipping statistics a parquet/Iceberg writer records per
    file, computed here per layout unit (e.g. the ``zbucket`` a Z-order
    write would range-partition by).

    This is how the Z-order claim gets MEASURED instead of asserted: a
    range predicate scans only the files whose [min, max] intersects it
    (see :func:`zone_scan_flag`), so the fraction of files with
    ``would_scan = false`` IS the pruning rate.  One map-side-combined
    aggregate on the file key; the output is metadata-sized (one row
    per file, ~10^6 rows at 100 TB)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(file_col).agg(*aggs)


def zone_scan_flag(col: str, lo, hi) -> Column:
    """Would a file with this zone map be scanned for
    ``col BETWEEN lo AND hi``?  False ⇔ the file is pruned."""
    return ~((F.col(f"{col}_max") < lo) | (F.col(f"{col}_min") > hi))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort_by: str | None = None,
) -> None:
    """Materialize ``df`` as a BUCKETED external table (Spark's
    pre-shuffled layout): rows are hash-partitioned into ``n_buckets``
    files by ``key`` at WRITE time, so every later equi-join or
    aggregation on ``key`` between same-bucketed tables plans with NO
    exchange — the shuffle is paid once at ingest instead of per query
    (pinned in test_stats_layout: zero Exchange in the join plan).

    This is the engine's co-located-join device for the 100 TB fact
    tables (mentions ⋈ triples ⋈ link_scores all key on doc_id): at
    1000 executors the per-query doc_id shuffle is the dominant cost,
    and bucketing amortizes it across every downstream query.  The
    table is EXTERNAL (data at ``path``) so the catalog entry is
    metadata only; callers own the path's lifecycle."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    order_col: str,
    part_col: str,
) -> DataFrame:
    """Small-file compaction planner (the Iceberg/Delta ``binpack``
    shape): carve the sort-ordered file inventory of each partition
    into rewrite bins of ~``target_bytes``:
    ``bin = floor(running_bytes_before / target)``.

    Ordered carving, not true first-fit — deliberately: it is a pure
    window cumsum (deterministic, distributed, no sequential bin
    state), keeps the partition's sort order inside each bin (so a
    Z-ordered table stays Z-ordered through compaction), and
    over-target files simply occupy their own bins.  The inventory is
    metadata (one row per file); the per-partition window is over at
    most a few thousand rows even at 100 TB."""
    w = Window.partitionBy(part_col).orderBy(F.col(order_col).asc())
    before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        files.withColumn("bin", F.floor(before / target_bytes).cast("long"))
        .groupBy(part_col, "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(size_col).cast("long").alias("bin_bytes"),
            F.min(order_col).alias("first_file"),
            F.max(order_col).alias("last_file"),
        )
    )
