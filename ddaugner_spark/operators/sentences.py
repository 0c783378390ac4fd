"""Sentence model: re-segmentation (W5) and context windows (W1).

Reference semantics:

* re-segmentation — running count of end-punctuation tokens as sentence id
  (/root/reference/ddaugner/datas/datas.py:303-313); the synthetic
  vocabulary's terminator is ``config.SENT_TERM``;
* context windows — ``NERSentence.sents_with_surrounding_context``
  (/root/reference/ddaugner/datas/datas.py:27-64): ±k neighboring
  sentences attached per sentence, ``None`` padding at document edges.

Scale notes: token→sentence assignment is a narrow per-doc array pass;
the per-sentence rollup is one hash aggregation keyed (doc_id, sent_id)
with map-side partial aggregation, and the context join is a window over
the same key — both AQE-coalesced.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from .mentions import with_tokens


def tokens_long(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exploded (doc_id, pos, tok, sent_id) token table.

    sent_id comes from the classic run-id window trick: a running sum of
    terminator indicators over *preceding* positions.
    """
    df = with_tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode("tokens").alias("pos", "tok"))
        .withColumn(
            "sent_id",
            F.coalesce(
                F.sum((F.col("tok") == config.SENT_TERM).cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )


def sentences_df(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sent_id, n_toks, first_tok, last_tok) per-sentence rollup."""
    toks = tokens_long(docs, id_col)
    return toks.groupBy("doc_id", "sent_id").agg(
        F.count("*").alias("n_toks"),
        F.min_by("tok", "pos").alias("first_tok"),
        F.max_by("tok", "pos").alias("last_tok"),
    )


def context_features(docs: DataFrame, k: int = 1, id_col: str = "doc_id") -> DataFrame:
    """M2 featurization shape (datas.py:228-283): per sentence, the
    concatenation left_ctx ++ center ++ right_ctx with a 0/1 center mask.

    Returns (doc_id, sent_id, ctx_tokens array<string>, center_mask
    array<int>, n_ctx, n_center).  ``None`` neighbors at document edges
    contribute empty context (datas.py:47-49 padding)."""
    toks = tokens_long(docs, id_col)
    sent_toks = toks.groupBy("doc_id", "sent_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("pt")
    ).select(
        "doc_id", "sent_id", F.transform("pt", lambda x: x["tok"]).alias("stoks")
    )
    w = Window.partitionBy("doc_id").orderBy("sent_id")
    empty = F.array().cast("array<string>")
    # ±k neighbors each contribute their full token list, nearest-last on
    # the left / nearest-first on the right (datas.py:254-271 concat order)
    left = F.concat(
        *[F.coalesce(F.lag("stoks", d).over(w), empty) for d in range(k, 0, -1)]
    )
    right = F.concat(
        *[F.coalesce(F.lead("stoks", d).over(w), empty) for d in range(1, k + 1)]
    )
    out = sent_toks.select(
        "doc_id",
        "sent_id",
        F.concat(left, F.col("stoks"), right).alias("ctx_tokens"),
        F.concat(
            F.transform(left, lambda _: F.lit(0)),
            F.transform(F.col("stoks"), lambda _: F.lit(1)),
            F.transform(right, lambda _: F.lit(0)),
        ).alias("center_mask"),
    )
    return out.withColumn("n_ctx", F.size("ctx_tokens").cast("long")).withColumn(
        "n_center",
        F.size(F.filter("center_mask", lambda m: m == 1)).cast("long"),
    )


def context_windows(sentences: DataFrame, k: int = 1) -> DataFrame:
    """Attach neighbor-sentence sizes as context (W1, k=±1 by default).

    Mirrors datas.py:27-64's ``None`` padding: missing neighbors surface
    as 0-sized context (the featurizer concatenates empty context,
    datas.py:254-271)."""
    w = Window.partitionBy("doc_id").orderBy("sent_id")
    out = sentences
    for d in range(1, k + 1):
        out = out.withColumn(
            f"left_{d}_n", F.coalesce(F.lag("n_toks", d).over(w), F.lit(0))
        ).withColumn(
            f"right_{d}_n", F.coalesce(F.lead("n_toks", d).over(w), F.lit(0))
        )
    return out
