"""Text analysis operators: quality scoring, language-ID, token counting,
document fingerprinting.

Training-data-pipeline operators (not in the reference, which consumes
pre-tokenized CoNLL).  All pure column expressions — no Python.

* quality     — length / stopword-ratio / distinct-ratio features
                (the standard C4/Gopher-style filters);
* language-ID — char-bigram profile voting: per-lang bigram counts are a
                tiny aggregate (broadcast at scale); a doc's predicted
                lang is the argmax of summed profile votes over its
                bigrams.  Integer votes → engine-exact, no float hazard;
* token count — whitespace tokens + a BPE-ish subword estimate;
* fingerprint — md5 content hash + a coarse locality key (first/last
                token + length bucket) for shard-local grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config


def quality_features(docs: DataFrame, ndigits: int = 4) -> DataFrame:
    # NULL text is an empty doc, not a NULL-stats doc (keeps the stat
    # columns non-nullable ints; split('', ' ') == [''] on both engines)
    docs = docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(config.STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(n_distinct / n, ndigits).alias("distinct_ratio"),
        F.round(n_stop / n, ndigits).alias("stop_ratio"),
        F.round((F.length("text") - (n - 1)) / n, ndigits).alias("avg_word_len"),
    )


def char_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bigram) — all character bigrams per doc (narrow
    sequence+transform, 1-based substr)."""
    n = F.length("text")
    seq = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.transform(seq, lambda i: F.col("text").substr(i, F.lit(2)))).alias(
            "bigram"
        ),
    )


def langid_predictions(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang): n-gram-profile language ID.

    Profile = per-(lang, bigram) counts over the corpus (tiny: langs ×
    distinct bigrams; broadcast).  Vote(doc, lang) = Σ over the doc's
    bigrams of profile count.  pred = argmax by (votes desc, lang asc).
    On the synthetic corpus text is independent of lang, so this measures
    the *operator*, not model accuracy.

    Scale shape: the per-char explode is map-only and BOTH groupBys run
    hash partial aggregation before their exchange, so shuffled volume
    is distinct (lang, bigram) rows for the profile and (doc × langs)
    rows for the votes — NOT ~len(text) rows per doc.  The exploded rows
    exist only transiently inside the map task."""
    bg = char_bigrams(docs)
    profile = bg.groupBy(F.col("lang").alias("p_lang"), "bigram").agg(
        F.count("*").alias("votes")
    )
    doc_bg = bg.groupBy("doc_id", "lang", "bigram").agg(F.count("*").alias("n"))
    scored = (
        doc_bg.join(F.broadcast(profile), "bigram")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.sum(F.col("n") * F.col("votes")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("p_lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("pred_lang"))
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, n_chars, bpe_estimate): whitespace token count
    plus the standard chars/4 BPE-subword estimate. NULL text counts as
    an empty doc (see quality_features)."""
    docs = docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("ws_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.greatest(F.lit(1), F.ceil(F.length("text") / 4)).cast("long").alias("bpe_estimate"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, content_hash, locality_key): md5 content hash + coarse
    locality key (first token | last token | log2 length bucket).

    Content fingerprints are undefined for null/empty docs (log2(0),
    md5(NULL)); such rows are filtered on both the Spark and oracle
    sides — a real crawl dedups them via the exact-hash path instead."""
    docs = docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
    toks = F.split(F.col("text"), " ")
    bucket = F.floor(F.log2(F.length("text").cast("double"))).cast("long")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.concat_ws(
            "|", F.element_at(toks, 1), F.element_at(toks, -1), bucket.cast("string")
        ).alias("locality_key"),
    )
