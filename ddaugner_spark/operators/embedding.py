"""Document embedding generation + embedding-space near-duplicate search.

Training-data pipelines embed documents to dedup/cluster them before
NER.  Real encoders are not in this container; the featurizer here is a
**hashed signed-count embedding** (feature-hashing): dimension j is the
sum over distinct tokens of ±1 decided by hex digit j of md5(token).
Properties that matter for the engine:

* integer arithmetic end-to-end → the DuckDB oracle matches exactly
  (no float-summation-order hazard);
* same locality behavior as simhash (near-identical token sets →
  near-identical vectors), so cosine near-dup search over it is a
  faithful stand-in for encoder embeddings;
* pure column expressions — the featurizer is map-only and the swap
  point for a real encoder is a mapInPandas batch (same schema).

Pair search blocks candidates on the simhash-style sign pattern of the
leading dimensions (exact equality — no recall loss for near-identical
docs) and verifies with exact cosine over the integer vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIMS = 16
BLOCK_DIMS = 6


def hashed_doc_embeddings(docs: DataFrame, dims: int = EMBED_DIMS) -> DataFrame:
    """(doc_id, v_0..v_{dims-1} int, norm_sq long) — signed-count hashed
    embedding over distinct tokens."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    aggs = [
        F.sum(
            F.when(
                F.substring(F.col("h"), j + 1, 1).isin(list("89abcdef")), 1
            ).otherwise(-1)
        )
        .cast("long")
        .alias(f"v_{j}")
        for j in range(dims)
    ]
    out = toks.groupBy("doc_id").agg(*aggs)
    norm_sq = sum(F.col(f"v_{j}") * F.col(f"v_{j}") for j in range(dims))
    return out.withColumn("norm_sq", norm_sq.cast("long"))


def _block_key(dims: int = BLOCK_DIMS) -> Column:
    return F.concat(
        *[
            F.when(F.col(f"v_{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(dims)
        ]
    )


def embedding_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.95,
    dims: int = EMBED_DIMS,
    ndigits: int = 4,
) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ threshold, blocked on the sign
    pattern of the first BLOCK_DIMS dimensions."""
    emb = hashed_doc_embeddings(docs, dims).withColumn("blk", _block_key())
    a = emb.select(
        F.col("blk"),
        F.col("doc_id").alias("a"),
        F.col("norm_sq").alias("na"),
        *[F.col(f"v_{j}").alias(f"a_{j}") for j in range(dims)],
    )
    b = emb.select(
        F.col("blk"),
        F.col("doc_id").alias("b"),
        F.col("norm_sq").alias("nb"),
        *[F.col(f"v_{j}").alias(f"b_{j}") for j in range(dims)],
    )
    dot = sum(F.col(f"a_{j}") * F.col(f"b_{j}") for j in range(dims))
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos",
            dot.cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", ndigits).alias("cos"))
    )
