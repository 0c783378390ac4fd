"""Distinct-count sketching: K-Minimum-Values (KMV / bottom-k).

Spark's built-in ``approx_count_distinct`` is HLL++ whose register
state isn't reproducible across engines; KMV with an md5 hash is FULLY
DETERMINISTIC — the same k smallest hashes on any engine — so the
DuckDB oracle replays the sketch bit-for-bit (the same property the
rest of the engine's dedup/minhash operators rely on).

Estimator (Bar-Yossef et al.): with h ~ U[0,1) per distinct value,
``D̂ = (k−1) / h_(k)`` where h_(k) is the k-th smallest hash; exact when
the group has < k distinct values.  Error ~ 1/√k.

Scale shape: a true sketch must keep only k values per group on the map
side.  ``kmv_sketch`` runs the partial step as an Arrow batch pass (one
bottom-k heap per group per partition → at most partitions·groups·k
rows reach the exchange), then merges bottom-k sets with
``sort_array``/``slice`` — the same partial/final split a native UDAF
would have.  Sketches MERGE (union of bottom-k is the bottom-k of the
union), pytest-pinned.
"""

from __future__ import annotations

import hashlib
import heapq
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

#: use the first 12 hex digits as the uniform draw (48 bits — plenty,
#: and exactly reproducible as integer arithmetic in SQL)
_HEX_DIGITS = 12
_SCALE = 16 ** _HEX_DIGITS


def _partial_schema(group_col: str) -> StructType:
    return StructType(
        [
            StructField(group_col, StringType()),
            StructField("mins", ArrayType(StringType())),
        ]
    )


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, n_distinct_est, n_kept): KMV distinct-count sketch."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heaps: dict[str, list] = {}  # group -> max-heap of negated hashes
        seen: dict[str, set] = {}
        for pdf in batches:
            for g, v in zip(pdf[group_col], pdf[value_col]):
                h = hashlib.md5(str(v).encode()).hexdigest()[:_HEX_DIGITS]
                s = seen.setdefault(g, set())
                if h in s:
                    continue
                heap = heaps.setdefault(g, [])
                if len(heap) < k:
                    heapq.heappush(heap, _neg(h))
                    s.add(h)
                elif h < _pos(heap[0]):
                    dropped = heapq.heapreplace(heap, _neg(h))
                    s.discard(_pos(dropped))
                    s.add(h)
        yield pd.DataFrame(
            {
                group_col: list(heaps),
                "mins": [sorted(_pos(x) for x in heap) for heap in heaps.values()],
            }
        )

    partials = df.select(
        F.col(group_col).cast("string").alias(group_col), F.col(value_col)
    ).mapInPandas(partial, _partial_schema(group_col))

    merged = partials.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    n_kept = F.size("mins")
    kth = F.element_at("mins", k)  # NULL when < k distinct (size < k)
    frac = (
        F.conv(kth, 16, 10).cast("double") / F.lit(float(_SCALE))
    )
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.round((F.lit(k - 1)) / frac, 2)
    )
    return merged.select(
        group_col,
        est.alias("n_distinct_est"),
        n_kept.cast("long").alias("n_kept"),
    )


def _neg(h: str) -> str:
    """Invert hex string order so heapq's min-heap acts as a max-heap."""
    return "".join("%x" % (15 - int(c, 16)) for c in h)


_pos = _neg  # involution
