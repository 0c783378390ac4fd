"""Lexical-overlap study operators (J5/A11/U4).

Reference semantics (/root/reference/lexical_overlap.py):

* ``exact_match`` — set intersection of two name sets (:19-23);
* ``wp_partial_match`` — two names partially match when they share any
  wordpiece, excluding titles/stopwords (:53-78).  Wordpieces come from
  the engine's REAL greedy WordPiece tokenizer
  (functions/wordpiece.py — HF algorithm over the engine-owned vocab;
  a real BERT vocab.txt drops into config.WORDPIECE_*);
* ``overlap_subsets`` ratios: |exact|/|target|, |partial|/|target|,
  |new|/|target| (:81-93).

Scale: subword explode + equi-join; both sides are name dictionaries
(≤ tens of thousands of rows) so either side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config


def _subwords(col):
    from ..functions import wordpiece_pieces

    words = F.split(col, " ")
    return F.array_distinct(
        F.flatten(F.transform(words, lambda w: wordpiece_pieces(w)))
    )


def _filtered_subwords(col):
    return F.filter(_subwords(col), lambda s: ~s.isin(config.STOPWORDS))


def overlap_subsets(target: DataFrame, other: DataFrame, ndigits: int = 4) -> DataFrame:
    """target/other: single-column ``name`` DataFrames.  Returns one row
    (n_target, n_exact, n_partial, n_new, exact_ratio, partial_ratio,
    new_ratio) with the reference's subset precedence: exact ⊂ partial
    pool is removed first (lexical_overlap.py:84-87)."""
    t = target.select("name").distinct()
    o = other.select("name").distinct()

    exact = t.join(o, "name", "semi")
    rest = t.join(o, "name", "anti")

    t_sub = rest.select("name", F.explode(_filtered_subwords(F.col("name"))).alias("sub"))
    o_sub = o.select(F.explode(_filtered_subwords(F.col("name"))).alias("sub")).distinct()
    partial = t_sub.join(F.broadcast(o_sub), "sub", "semi").select("name").distinct()

    counts = (
        t.agg(F.count("*").alias("n_target"))
        .crossJoin(exact.agg(F.count("*").alias("n_exact")))
        .crossJoin(partial.agg(F.count("*").alias("n_partial")))
    )
    return counts.select(
        "n_target",
        "n_exact",
        "n_partial",
        (F.col("n_target") - F.col("n_exact") - F.col("n_partial")).alias("n_new"),
        F.round(F.col("n_exact") / F.col("n_target"), ndigits).alias("exact_ratio"),
        F.round(F.col("n_partial") / F.col("n_target"), ndigits).alias("partial_ratio"),
        F.round(
            (F.col("n_target") - F.col("n_exact") - F.col("n_partial"))
            / F.col("n_target"),
            ndigits,
        ).alias("new_ratio"),
    )
