"""(subj, pred, obj) triple extraction from mention pairs.

The reference has no triple stage — this is the KG-construction layer the
north_star adds on top of ddaugNER's mention detection.  The pattern rule
is the deterministic analogue of "dependency-like patterns": two mentions
in the same sentence, separated by 1..TRIPLE_MAX_GAP tokens, with a
predicate-vocabulary token strictly between them; the *first* such token
(min position) is the relation, mirroring leftmost-match precedence of
``search_ner_pattern`` (/root/reference/ddaugner/utils.py:59-78).

Scale notes: the self-join of mentions is keyed (doc_id, sent_id) — both
sides co-partition on the same hash, so AQE plans a single shuffle of the
mention table (≪ token volume).  The gap bound keeps candidates linear in
sentence length.  Predicate positions ride along as a per-doc array (no
third join): ``min(filter(pred_positions, between))`` is a narrow
expression on the already-joined row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from .mentions import with_bio, _tok, sent_id_at


def mentions_with_preds(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mentions_df + a per-doc ``pred_positions`` array column and the
    ``tokens`` array (needed to render the predicate surface)."""
    df = with_bio(docs)
    n = F.col("n_tokens")
    seq1 = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    df = df.withColumn(
        "pred_positions", F.filter(seq1, lambda i: _tok(i).isin(config.PRED_WORDS))
    )
    m_big = F.transform(
        F.col("big_starts"),
        lambda i: F.struct(
            i.cast("long").alias("start_idx"),
            (i + F.lit(1)).cast("long").alias("end_idx"),
            F.concat(_tok(i), F.lit(" "), _tok(i + F.lit(1))).alias("surface"),
            F.lit("ORG").alias("tag"),
        ),
    )
    m_uni = F.transform(
        F.col("uni_hits"),
        lambda i: F.struct(
            i.cast("long").alias("start_idx"),
            i.cast("long").alias("end_idx"),
            _tok(i).alias("surface"),
            F.when(_tok(i).isin(config.PER_WORDS), F.lit("PER"))
            .otherwise(F.lit("LOC"))
            .alias("tag"),
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col("tokens"),
        F.col("pred_positions"),
        F.explode(F.concat(m_big, m_uni)).alias("m"),
    )
    return exploded.select(
        "doc_id",
        "tokens",
        "pred_positions",
        sent_id_at(F.col("m.start_idx")).alias("sent_id"),
        F.col("m.start_idx").alias("start_idx"),
        F.col("m.end_idx").alias("end_idx"),
        F.col("m.surface").alias("surface"),
        F.col("m.tag").alias("tag"),
    )


def triples_df(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sent_id, subj, subj_tag, pred, obj, obj_tag,
    subj_start, obj_start) triple rows."""
    m = mentions_with_preds(docs, id_col)
    subj = m.alias("s")
    obj = m.select("doc_id", "sent_id", "start_idx", "end_idx", "surface", "tag").alias("o")

    joined = subj.join(
        obj,
        on=[
            F.col("s.doc_id") == F.col("o.doc_id"),
            F.col("s.sent_id") == F.col("o.sent_id"),
            F.col("o.start_idx") > F.col("s.end_idx") + 1,
            F.col("o.start_idx") <= F.col("s.end_idx") + 1 + config.TRIPLE_MAX_GAP,
        ],
    )
    pred_pos = F.array_min(
        F.filter(
            F.col("s.pred_positions"),
            lambda p: (p > F.col("s.end_idx")) & (p < F.col("o.start_idx")),
        )
    )
    return (
        joined.withColumn("pred_pos", pred_pos)
        .filter(F.col("pred_pos").isNotNull())
        .select(
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.sent_id").alias("sent_id"),
            F.col("s.surface").alias("subj"),
            F.col("s.tag").alias("subj_tag"),
            F.element_at(F.col("s.tokens"), (F.col("pred_pos") + 1).cast("int")).alias("pred"),
            F.col("o.surface").alias("obj"),
            F.col("o.tag").alias("obj_tag"),
            F.col("s.start_idx").alias("subj_start"),
            F.col("o.start_idx").alias("obj_start"),
        )
    )
