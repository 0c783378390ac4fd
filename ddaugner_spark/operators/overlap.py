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


def bitext_candidates(
    docs: DataFrame, max_df: int = 10, min_shared: int = 2
) -> DataFrame:
    """(doc_a, doc_b, lang_a, lang_b, n_shared) — cross-lingual
    document-pair mining via shared RARE tokens (the hunt for
    translation/parallel pairs in a multilingual crawl, WikiMatrix-style
    but anchor-based): a token is an anchor iff its document frequency
    is ≤ ``max_df`` (names, numbers, codes survive translation; common
    words don't), and a candidate pair is two docs of DIFFERENT
    languages sharing ≥ ``min_shared`` anchors.

    Scale shape: distinct (doc, token) once (hash aggregate), df per
    token re-aggregated from that output (shuffle reuse), anchors kept
    by an ≤ max_df filter — so the self-join fans out at most
    C(max_df, 2) pairs per anchor, df-bounded by construction, never
    corpus².  The pair aggregate is the only further shuffle.
    """
    dt = (
        docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("")).alias("lang"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    df_tok = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    anchors = dt.join(
        df_tok.filter(F.col("df") <= max_df).select("token"), "token"
    )
    a = anchors.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"), "token"
    )
    b = anchors.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"), "token"
    )
    return (
        a.join(b, "token")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("lang_a") != F.col("lang_b")))
        .groupBy("doc_a", "doc_b", "lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
