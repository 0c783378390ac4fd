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

from pyspark.sql import Column, DataFrame
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
