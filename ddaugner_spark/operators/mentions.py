"""Dictionary-augmented mention detection (the ddaugNER core, Spark-first).

Reference semantics being lifted (SURVEY.md J1/W2/W3/P1):

* n-gram gazetteer window match, longest-n-first —
  /root/reference/fix_ner.py:195-215 (``windowed`` n=5..1 over tokens,
  retag ``B-PER I-PER*`` on dictionary hit);
* BIO-run decoding into entity spans —
  /root/reference/ddaugner/utils.py:111-166;
* sentence ids from running terminator counts —
  /root/reference/ddaugner/datas/datas.py:303-313.

Scale design: everything here is **narrow** — per-row array expressions
(``filter``/``transform``/``sequence`` higher-order functions) that stay
inside whole-stage codegen.  There is *no shuffle and no Python* in mention
detection: a 100 TB pages scan streams through map-only stages, and the
gazetteer never leaves the closure (it is inlined as literal arrays — the
broadcast-join formulation in :mod:`.linking` is used when the dictionary
is too big to inline, with ``F.broadcast`` keeping it off the shuffle).

Longest-match-first is implemented as: bigram matches claim their
positions; unigram matches apply only on unclaimed positions.  With the
dictionary invariants documented in ``config.py`` (bigram first/second
word sets disjoint) this equals the reference's greedy n-desc scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config


def _tok(i: Column) -> Column:
    """tokens[i] for 0-based i (element_at is 1-based)."""
    return F.element_at(F.col("tokens"), (i + F.lit(1)).cast("int"))


def _bigram(i: Column) -> Column:
    return F.concat(_tok(i), F.lit(" "), _tok(i + F.lit(1)))


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization — matches the oracle's ``string_split``.

    Null-safe: real crawls carry null/empty text rows; they tokenize to
    an empty array (and therefore produce no mentions) instead of
    poisoning downstream array expressions with nulls."""
    toks = F.when(
        F.col(text_col).isNull() | (F.col(text_col) == ""),
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.col(text_col), " "))
    return docs.withColumn("tokens", toks).withColumn("n_tokens", F.size("tokens"))


def sent_id_at(pos: Column) -> Column:
    """Sentence id of token position ``pos`` = number of terminator tokens
    strictly before it (datas.py:303-313: sentences split *after* the
    terminator, which therefore belongs to the preceding sentence)."""
    return F.size(
        F.filter(
            F.slice(F.col("tokens"), F.lit(1), pos.cast("int")),
            lambda t: t == F.lit(config.SENT_TERM),
        )
    ).cast("long")


def _is_big_start(i: Column) -> Column:
    """O(1) predicate: a gazetteer bigram starts at position i.

    Because ORG_BIGRAMS' first-word and second-word sets are disjoint
    (config.py invariant), bigram matches can never overlap — so
    "position claimed by a bigram" reduces to "a bigram starts at i or at
    i-1", with no materialized position set.  This keeps every per-position
    check O(1); Catalyst does NOT common-subexpression-eliminate inside
    lambda functions, so referencing a computed array column from within a
    ``transform`` lambda re-evaluates the whole array per element (O(n³)
    per doc — measured 100×+ slowdown before this formulation)."""
    return (i >= 0) & _bigram(i).isin(config.ORG_BIGRAMS)


def _covered(i: Column, n: Column) -> Column:
    at_i = (i <= n - 2) & _is_big_start(i)
    at_prev = (i >= 1) & _is_big_start(i - F.lit(1))
    return at_i | at_prev


def with_bio(docs: DataFrame) -> DataFrame:
    """Adds ``tokens``, match-position arrays and a full per-doc BIO
    ``tags`` array.  All narrow expressions, O(n) per document.

    Columns added: tokens, n_tokens, big_starts (0-based start positions
    of bigram gazetteer hits), uni_hits (unigram hit positions after
    longest-match suppression), tags.
    """
    df = with_tokens(docs)
    n = F.col("n_tokens")

    seq1 = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    seq2 = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )

    df = df.withColumn("big_starts", F.filter(seq2, _is_big_start))
    uni_words = config.PER_WORDS + config.LOC_WORDS
    df = df.withColumn(
        "uni_hits",
        F.filter(seq1, lambda i: _tok(i).isin(uni_words) & ~_covered(i, n)),
    )
    df = df.withColumn(
        "tags",
        F.transform(
            seq1,
            lambda i: F.when((i <= n - 2) & _is_big_start(i), F.lit("B-ORG"))
            .when((i >= 1) & _is_big_start(i - F.lit(1)), F.lit("I-ORG"))
            .when(
                _tok(i).isin(config.PER_WORDS) & ~_covered(i, n), F.lit("B-PER")
            )
            .when(
                _tok(i).isin(config.LOC_WORDS) & ~_covered(i, n), F.lit("B-LOC")
            )
            .otherwise(F.lit("O")),
        ),
    )
    return df


def with_naive_bio(docs: DataFrame) -> DataFrame:
    """Unigram-only BIO tags with no longest-match suppression — the
    'raw model output' stand-in used by the scoring/error-span demos."""
    df = with_tokens(docs)
    n = F.col("n_tokens")
    seq1 = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(
        "tags",
        F.transform(
            seq1,
            lambda i: F.when(_tok(i).isin(config.PER_WORDS), F.lit("B-PER"))
            .when(_tok(i).isin(config.LOC_WORDS), F.lit("B-LOC"))
            .otherwise(F.lit("O")),
        ),
    )


def mentions_df(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sent_id, start_idx, end_idx, surface, tag) mention rows.

    ``end_idx`` inclusive (reference convention utils.py:19-22);
    ``start_idx``/``end_idx`` are document-level 0-based token positions.
    """
    df = with_bio(docs)
    m_big = F.transform(
        F.col("big_starts"),
        lambda i: F.struct(
            i.cast("long").alias("start_idx"),
            (i + F.lit(1)).cast("long").alias("end_idx"),
            _bigram(i).alias("surface"),
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
        F.explode(F.concat(m_big, m_uni)).alias("m"),
    )
    return exploded.select(
        "doc_id",
        sent_id_at(F.col("m.start_idx")).alias("sent_id"),
        F.col("m.start_idx").alias("start_idx"),
        F.col("m.end_idx").alias("end_idx"),
        F.col("m.surface").alias("surface"),
        F.col("m.tag").alias("tag"),
    )


def naive_mentions_df(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Unigram-only tagger with *no* longest-match suppression — the
    deliberately-imperfect "prediction" side for the A5/J4 scoring demo
    (analogous to scoring a model's raw tags against fixed gold spans,
    extract_metrics.py:35-59)."""
    df = with_tokens(docs)
    n = F.col("n_tokens")
    seq1 = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    uni_words = config.PER_WORDS + config.LOC_WORDS
    hits = F.filter(seq1, lambda i: _tok(i).isin(uni_words))
    m = F.transform(
        hits,
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
        F.col(id_col).alias("doc_id"), F.col("tokens"), F.explode(m).alias("m")
    )
    return exploded.select(
        "doc_id",
        sent_id_at(F.col("m.start_idx")).alias("sent_id"),
        F.col("m.start_idx").alias("start_idx"),
        F.col("m.end_idx").alias("end_idx"),
        F.col("m.surface").alias("surface"),
        F.col("m.tag").alias("tag"),
    )
