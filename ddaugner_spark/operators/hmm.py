"""Viterbi decoding of a fixed-parameter HMM tagger over sentences —
the classical sequence-labeling baseline that sits next to the
container-gated BERT tagger (operators/tagging.py): where the model
stub scores tokens independently, the HMM couples adjacent tags
through a transition matrix and Viterbi extracts the globally best
tag path per sentence (reference contract: the BIO sequence semantics
of predict.py's per-sentence tagging loop, here with a closed-form
model instead of learned weights).

ALL scores are EXACT INTEGERS (log-space scores scaled to small
ints), so the DP max/argmax is deterministic on both engines — no
float comparison anywhere.  Ties prefer the LOWER state index
(O < PER < LOC), stated so the SQL twin replays the identical CASE
ladder.

Scale shape: tokens explode once (corpus-sized, map-only), one
shuffle groups each sentence's tokens into a sorted array (the same
(doc_id, sent_id) key every sentence-level operator shares), then the
whole forward pass + path carry runs INSIDE one ``F.aggregate`` fold
per sentence — O(k²·len) integer ops per sentence, no join, no
per-row Python.  The fold state is 3 (score, path-string) pairs, so
memory per row is O(len), and the posexplode that re-rows the path is
map-only.  At 10¹²-document scale nothing here shuffles more than the
token table once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ddaugner_spark import config
from ddaugner_spark.operators.sentences import tokens_long

#: state order is LOAD-BEARING (tiebreaks prefer the lower index)
STATES = ["O", "PER", "LOC"]

#: start bonus per state: sentences open with O more often than not
START = [2, 0, 0]

#: transition scores T[i][j] (from-state i -> to-state j): sticky
#: entity runs, mild penalty for jumping PER<->LOC directly
TRANS = [
    [3, 0, 0],
    [1, 4, -2],
    [1, -2, 4],
]

#: emission weights (integers): dictionary hit, capitalized first
#: char, stopword; O rewards stopwords and uncapitalized tokens
E_HIT, E_CAP, E_STOP, E_O_STOP, E_O_LOW, E_O_BASE = 10, 3, 4, 2, 4, 1


def _emit(tok):
    """Per-token emission score column for each state, exact ints.

    is_cap via ascii-range check (identical semantics on DuckDB, no
    regex dialect risk); membership via the config literal lists.
    """
    is_cap = (
        (F.ascii(F.substring(tok, 1, 1)) >= 65)
        & (F.ascii(F.substring(tok, 1, 1)) <= 90)
    ).cast("long")
    is_stop = tok.isin(config.STOPWORDS).cast("long")
    e_per = (
        F.lit(E_HIT) * tok.isin(config.PER_WORDS).cast("long")
        + F.lit(E_CAP) * is_cap
        - F.lit(E_STOP) * is_stop
    )
    e_loc = (
        F.lit(E_HIT) * tok.isin(config.LOC_WORDS).cast("long")
        + F.lit(E_CAP) * is_cap
        - F.lit(E_STOP) * is_stop
    )
    e_o = (
        F.lit(E_O_STOP) * is_stop
        + F.lit(E_O_LOW) * (1 - is_cap)
        + F.lit(E_O_BASE)
    )
    return [e_o, e_per, e_loc]


def _best_pred(cands):
    """(score, argmax index) over candidate columns, ties -> lower i."""
    c0, c1, c2 = cands
    best = F.greatest(c0, c1, c2)
    arg = (
        F.when((c0 >= c1) & (c0 >= c2), F.lit(0))
        .when(c1 >= c2, F.lit(1))
        .otherwise(F.lit(2))
    )
    return best, arg


def viterbi_tag(docs: DataFrame) -> DataFrame:
    """(doc_id, sent_id, pos, tok, state) — the Viterbi-optimal state
    per token under the module-constant HMM, pos the document-global
    token position (so downstream BIO/mention consumers join on the
    same key as every other token-level operator)."""
    toks = tokens_long(docs)
    sent = toks.groupBy("doc_id", "sent_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("pt")
    )

    acc_t = (
        "struct<started:boolean,"
        "s0:bigint,p0:string,s1:bigint,p1:string,s2:bigint,p2:string>"
    )
    init = F.struct(
        F.lit(False).alias("started"),
        F.lit(0).cast("long").alias("s0"),
        F.lit("").alias("p0"),
        F.lit(0).cast("long").alias("s1"),
        F.lit("").alias("p1"),
        F.lit(0).cast("long").alias("s2"),
        F.lit("").alias("p2"),
    ).cast(acc_t)

    def step(acc, e):
        em = _emit(e["tok"])
        scores, paths = [], []
        for j in range(3):
            first_s = F.lit(START[j]) + em[j]
            first_p = F.lit(str(j))
            cands = [acc[f"s{i}"] + F.lit(TRANS[i][j]) for i in range(3)]
            best, arg = _best_pred(cands)
            stepped_s = best + em[j]
            stepped_p = F.concat(
                F.when(arg == 0, acc["p0"])
                .when(arg == 1, acc["p1"])
                .otherwise(acc["p2"]),
                F.lit("," + str(j)),
            )
            scores.append(
                F.when(acc["started"], stepped_s).otherwise(first_s)
            )
            paths.append(
                F.when(acc["started"], stepped_p).otherwise(first_p)
            )
        return F.struct(
            F.lit(True).alias("started"),
            scores[0].alias("s0"),
            paths[0].alias("p0"),
            scores[1].alias("s1"),
            paths[1].alias("p1"),
            scores[2].alias("s2"),
            paths[2].alias("p2"),
        )

    folded = sent.select(
        "doc_id",
        "sent_id",
        "pt",
        F.aggregate("pt", init, step).alias("dp"),
    )
    fin_best, fin_arg = _best_pred(
        [F.col("dp")["s0"], F.col("dp")["s1"], F.col("dp")["s2"]]
    )
    path = (
        F.when(fin_arg == 0, F.col("dp")["p0"])
        .when(fin_arg == 1, F.col("dp")["p1"])
        .otherwise(F.col("dp")["p2"])
    )
    with_path = folded.select(
        "doc_id",
        "sent_id",
        "pt",
        F.split(path, ",").alias("states"),
    )
    state_name = F.array([F.lit(s) for s in STATES])
    return with_path.select(
        "doc_id",
        "sent_id",
        F.posexplode(F.arrays_zip("pt", "states")).alias("k", "z"),
    ).select(
        "doc_id",
        "sent_id",
        F.col("z")["pt"]["pos"].cast("long").alias("pos"),
        F.col("z")["pt"]["tok"].alias("tok"),
        F.element_at(
            state_name, F.col("z")["states"].cast("int") + 1
        ).alias("state"),
    )
