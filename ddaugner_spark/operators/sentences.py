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
