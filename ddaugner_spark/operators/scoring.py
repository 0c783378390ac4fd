"""Entity-level set-match scoring and tag statistics.

Reference semantics:

* CoNLL-2003 entity-level P/R/F1 (seqeval semantics) —
  /root/reference/ddaugner/score.py:7-56: precision = |pred ∩ ref|/|pred|,
  recall = |pred ∩ ref|/|ref|, F1 harmonic mean; an entity matches iff
  (position span, class) are identical.  This is the engine's P/R≥0.95
  acceptance metric (BASELINE.json).
* ignored-class masking — score.py:42-50 (tags of ignored classes → 'O'
  on both sides) ≙ dropping mention rows of those classes (score.py:103-105).
* tag frequencies / weights — datas.py:205-226.
* entity-class counts & ratios — ner_utils.py:68-96.

Scale notes: the match is an inner join on the full span key
(doc_id, sent_id, start_idx, end_idx, tag); both sides are mention tables
(orders of magnitude smaller than tokens), co-partitioned by the join key
hash.  Counts are single-stage partial-aggregated; final P/R/F1 arithmetic
is on three scalars.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEY = ["doc_id", "sent_id", "start_idx", "end_idx", "tag"]


def filter_ignored(mentions: DataFrame, ignored_classes: Optional[Iterable[str]]) -> DataFrame:
    """score.py:103-105 — drop mentions of ignored classes."""
    if not ignored_classes:
        return mentions
    return mentions.filter(~F.col("tag").isin(list(ignored_classes)))


def entity_set_score(
    pred: DataFrame,
    gold: DataFrame,
    ignored_classes: Optional[Iterable[str]] = None,
    ndigits: int = 4,
) -> DataFrame:
    """One-row (n_pred, n_gold, n_match, precision, recall, f1).

    F1 is null when P+R == 0, matching score_ner_old's None
    (score.py:125-126); P (resp. R) is null when there are no predicted
    (resp. reference) entities (score.py:112-123)."""
    pred = filter_ignored(pred, ignored_classes).select(*SPAN_KEY).distinct()
    gold = filter_ignored(gold, ignored_classes).select(*SPAN_KEY).distinct()
    matched = pred.join(gold, on=SPAN_KEY, how="inner")

    counts = (
        pred.agg(F.count("*").alias("n_pred"))
        .crossJoin(gold.agg(F.count("*").alias("n_gold")))
        .crossJoin(matched.agg(F.count("*").alias("n_match")))
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_match") / F.col("n_pred"))
    r = F.when(F.col("n_gold") > 0, F.col("n_match") / F.col("n_gold"))
    return counts.select(
        "n_pred",
        "n_gold",
        "n_match",
        F.round(p, ndigits).alias("precision"),
        F.round(r, ndigits).alias("recall"),
        F.round(
            F.when((p + r) > 0, 2 * p * r / (p + r)),
            ndigits,
        ).alias("f1"),
    )


def tag_frequencies(docs_with_bio: DataFrame, ndigits: int = 6) -> DataFrame:
    """(tag, n, freq, weight) over the corpus BIO tags.

    freq = n / total (datas.py:205-214); weight = max_freq / freq
    (datas.py:216-226).  Window over the tiny aggregated table only."""
    tags = docs_with_bio.select(F.explode("tags").alias("tag"))
    counts = tags.groupBy("tag").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    return counts.select(
        "tag",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), ndigits).alias("freq"),
        F.round(F.max("n").over(w) / F.col("n"), ndigits).alias("weight"),
    )


def class_counts(mentions: DataFrame, ndigits: int = 6) -> DataFrame:
    """(tag, n, ratio): entity-class appearance counts and ratios
    (ner_utils.py:68-96)."""
    from pyspark.sql import Window

    counts = mentions.groupBy("tag").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "tag", "n", F.round(F.col("n") / F.sum("n").over(w), ndigits).alias("ratio")
    )


def majority_voting_table(mentions: DataFrame, tokens_long: DataFrame) -> DataFrame:
    """Corpus-level majority voting (utils.py:81-108 lifted to a groupBy):
    for each mention surface, count occurrences tagged as entities vs its
    total occurrences as a raw token n-gram; majority label per surface.

    Only unigram surfaces participate (multi-token surfaces would need the
    n-gram join of J1; the corpus analogue is identical in shape).
    Returns (surface, n_entity, n_o, majority) where majority follows the
    strict ``>`` of utils.py:101 (ties → 'O')."""
    ent = mentions.filter(F.col("start_idx") == F.col("end_idx")).groupBy(
        F.col("surface")
    ).agg(F.count("*").alias("n_entity"))
    occ = (
        tokens_long.join(F.broadcast(ent.select("surface")), tokens_long.tok == F.col("surface"))
        .groupBy("surface")
        .agg(F.count("*").alias("n_occ"))
    )
    return (
        ent.join(occ, "surface")
        .select(
            "surface",
            "n_entity",
            (F.col("n_occ") - F.col("n_entity")).alias("n_o"),
            F.when(F.col("n_entity") > (F.col("n_occ") - F.col("n_entity")), F.lit("ENTITY"))
            .otherwise(F.lit("O"))
            .alias("majority"),
        )
    )
