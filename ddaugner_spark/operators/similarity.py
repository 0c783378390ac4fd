"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operator set (not in the reference):

* brute-force cosine top-k — the exactness baseline: broadcast the query
  set, ``zip_with``/``aggregate`` dot products in the JVM (no Python),
  window top-k per query;
* sign-bucketed IVF — the scale path: a coarse quantizer assigns every
  vector to a cell (sign bits of the leading dims ≙ a fixed hyperplane
  LSH); search only the query's cell.  At 100 TB the cell assignment is a
  narrow map, the candidate join is an equi-join on cell id (hash
  partitioned, AQE-skew-safe), and recall is tuned by probing neighbor
  cells (multi-probe left as a union over cell ids);
* threshold search — all pairs with cosine ≥ t against the query set.

All arithmetic is done in float64 after casting each float32 element, in
left-to-right ``aggregate`` order, matching the DuckDB oracle's
element-wise sum to the last ulp in practice (scores are rounded for
comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import config


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = config.ANN_TOP_K,
    ndigits: int = 4,
) -> DataFrame:
    """(query_id, vec_id, rank, score): exact top-k by cosine per query.

    The query side is tiny → broadcast nested-loop join; the corpus side
    streams map-only.  Deterministic tiebreak on vec_id."""
    q = F.broadcast(
        embeddings.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    pairs = embeddings.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("raw_score", ndigits).alias("score"),
        )
    )


def sign_cell(emb: Column, dims: int = config.IVF_SIGN_DIMS) -> Column:
    """Coarse IVF cell id: concatenated sign bits of the first ``dims``
    float32 elements (exact comparison — no float-precision hazard)."""
    bits = [
        F.when(F.element_at(emb, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(dims)
    ]
    return F.concat(*bits)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = config.ANN_TOP_K,
    ndigits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign cell."""
    cells = embeddings.withColumn("cell", sign_cell(F.col("embedding")))
    q = F.broadcast(
        cells.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cell").alias("q_cell"),
        )
    )
    pairs = cells.join(q, cells.cell == q.q_cell).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("raw_score", ndigits).alias("score"),
        )
    )


def ivf_multiprobe_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = config.ANN_TOP_K,
    dims: int = config.IVF_SIGN_DIMS,
    ndigits: int = 4,
) -> DataFrame:
    """Multi-probe IVF: candidates come from the query's cell plus all
    cells at Hamming distance 1 (dims+1 probes) — the standard recall
    knob for sign-quantized IVF; brute-force recall is recovered as
    probes → 2^dims.  The candidate join stays an equi-ish join on cell
    ids; the probe fan-out multiplies only the tiny broadcast query side."""
    cells = embeddings.withColumn("cell", sign_cell(F.col("embedding"), dims))
    q0 = cells.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
    )
    # explode each query into its probe cells: the cell itself + 1-bit flips
    def flip(col, j):
        bit = F.substring(col, j + 1, 1)
        flipped = F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
        return F.concat(
            F.substring(col, 1, j), flipped, F.substring(col, j + 2, dims - j - 1)
        )

    probes = F.array(F.col("q_cell"), *[flip(F.col("q_cell"), j) for j in range(dims)])
    q = F.broadcast(q0.withColumn("probe", F.explode(probes)))
    pairs = cells.join(q, cells.cell == q.probe).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("raw_score", ndigits).alias("score"),
        )
    )


def threshold_pairs(
    embeddings: DataFrame,
    query_ids: list[int],
    threshold: float = config.COSINE_THRESHOLD,
    ndigits: int = 4,
) -> DataFrame:
    """(query_id, vec_id, score) with cosine ≥ threshold (embedding
    near-duplicate detection)."""
    q = F.broadcast(
        embeddings.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    pairs = embeddings.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    return (
        pairs.select(
            "query_id",
            "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score"),
        )
        .filter(F.col("raw_score") >= threshold)
        .select("query_id", "vec_id", F.round("raw_score", ndigits).alias("score"))
    )
