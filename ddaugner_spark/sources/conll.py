"""CoNLL fixture readers (SURVEY.md S1/S2/S4).

Semantics verified against the reference:

* 2-column CoNLL-2003 parse — strip file, split on blank lines, then per
  line ``token SP tag``; optional ``keep_only_classes`` rewriting non-kept
  tags to 'O'; ``usage_percentage`` prefix limit
  (/root/reference/ddaugner/datas/conll/conll.py:270-289).
* tag-only book files (one BIO tag per line, tokens stripped for
  copyright) — /root/reference/ner/{old,new}/*.conll[.fixed]; decoded to
  golden entity spans with ``entities_from_bio_tags`` semantics
  (utils.py:111-166).

Scale note: these fixture files are small training corpora (≤ a few MB),
so the file body is read with ``wholetext`` and split by *exactly* the
reference's ``split("\\n\\n")`` — one executor task per file, sentences
then explode into a distributed DataFrame.  Web-scale input never arrives
as CoNLL text; it arrives as the parquet/Iceberg pages table
(sources/pages.py).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_conll(
    spark: SparkSession,
    path: str,
    keep_only_classes: Optional[Iterable[str]] = None,
    usage_percentage: float = 1.0,
) -> DataFrame:
    """(doc_id, sent_id, tokens array<string>, tags array<string>).

    doc_id is the file index (one CoNLL file = one document stream);
    sent_id is the 0-based blank-line-separated sentence index — the same
    enumeration order as conll.py:275-287."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    # the reference reads with python universal newlines + .strip()
    # (conll.py:272): normalize CRLF (the in-repo corpora are CRLF) and
    # strip all leading/trailing whitespace (Spark's trim() only spaces)
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("value"), "\r\n?", "\n"), r"^\s+|\s+$", ""
    )
    sents = raw.select(
        "file",
        F.posexplode(F.split(stripped, "\n\n")).alias("sent_id", "sent"),
    )
    if usage_percentage < 1.0:
        # prefix limit per file (conll.py:289): keep first pct of sentences
        from pyspark.sql import Window

        w = Window.partitionBy("file")
        sents = (
            sents.withColumn("n_sents", F.count("*").over(w))
            .filter(F.col("sent_id") < (F.col("n_sents") * usage_percentage).cast("int"))
            .drop("n_sents")
        )
    lines = F.split(F.col("sent"), "\n")
    tokens = F.transform(lines, lambda l: F.element_at(F.split(l, " "), 1))
    tags = F.transform(lines, lambda l: F.element_at(F.split(l, " "), 2))
    if keep_only_classes:
        keep = list(keep_only_classes)
        tags = F.transform(
            tags,
            lambda t: F.when(F.substring(t, 3, 99).isin(keep), t).otherwise(F.lit("O")),
        )
    from pyspark.sql import Window

    return sents.select(
        F.dense_rank().over(Window.orderBy("file")).cast("long").alias("doc_id"),
        F.col("sent_id").cast("long"),
        tokens.alias("tokens"),
        tags.alias("tags"),
    )


def conll_export(
    sentences: DataFrame, path: str, pred_col: Optional[str] = None
) -> None:
    """S6 sink (ner_utils.py:42-65): write ``token gold [pred]`` lines,
    blank line between sentences.

    ``sentences``: (doc_id, sent_id, tokens, tags[, <pred_col>]).  Each
    sentence renders as newline-joined 2-or-3-column lines; sentences are
    joined with a blank separator per doc and written as one text part
    per partition (the reference writes one file per corpus; at scale
    the per-partition sharding is what you want)."""
    cols = [F.col("tokens"), F.col("tags")]
    if pred_col:
        cols.append(F.col(pred_col))
    line_arrays = F.zip_with(
        cols[0],
        cols[1],
        lambda t, g: F.concat_ws(" ", t, g),
    )
    if pred_col:
        line_arrays = F.zip_with(
            line_arrays, cols[2], lambda l, p: F.concat_ws(" ", l, p)
        )
    rendered = sentences.select(
        "doc_id", "sent_id", F.array_join(line_arrays, "\n").alias("block")
    )
    (
        rendered.orderBy("doc_id", "sent_id")
        .select(F.col("block").alias("value"))
        .write.mode("overwrite")
        .text(path, lineSep="\n\n")
    )


def read_tag_only(spark: SparkSession, path_glob: str) -> DataFrame:
    """(book, pos, tag) rows from tag-only .conll files (one tag per
    line), preserving line order via a per-file posexplode."""
    raw = spark.read.text(path_glob, wholetext=True).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)\.conll", 1).alias("book"),
        F.posexplode(
            F.split(
                F.regexp_replace(
                    F.regexp_replace(F.col("value"), "\r\n?", "\n"),
                    r"^\s+|\s+$",
                    "",
                ),
                "\n",
            )
        ).alias("pos", "tag"),
    )
    return raw.select("book", F.col("pos").cast("long"), F.trim(F.col("tag")).alias("tag"))


#: nltk-artifact token normalization (datas.py:320-341)
BOOK_TOKEN_FIXES = {
    "``": '"',
    "''": '"',
    "`": "'",
    "-LRB-": "(",
    "-RRB-": ")",
    "-LSB-": "[",
    "-RSB-": "]",
}


def read_book_sentences(
    spark: SparkSession,
    path_glob: str,
    fix_sent_tokenization: bool = True,
) -> DataFrame:
    """(book, sent_id, tokens, tags) from 2-column ``token tag`` book
    files (S2 complete — /root/reference/ddaugner/datas/datas.py:295-345):

    * sentences re-split after ``. ? !`` (and after ``''`` when
      ``fix_sent_tokenization``, BEFORE normalization — the reference
      checks the raw token);
    * with ``fix_sent_tokenization``, nltk artifact tokens are rewritten
      (``\\`\\``/''→", \\`→', -LRB-→( …, datas.py:320-341).

    Map-only after the per-file explode: the split is a running count of
    terminator tokens (the same window trick as sentence ids), the
    normalization a literal map lookup."""
    term = [".", "?", "!"] + ([ "''" ] if fix_sent_tokenization else [])
    raw = spark.read.text(path_glob, wholetext=True).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)\.conll", 1).alias("book"),
        F.posexplode(
            F.split(
                F.regexp_replace(
                    F.regexp_replace(F.col("value"), "\r\n?", "\n"),
                    r"^\s+|\s+$",
                    "",
                ),
                "\n",
            )
        ).alias("pos", "line"),
    )
    parts = F.split(F.trim("line"), " ")
    rows = raw.select(
        "book",
        F.col("pos").cast("long").alias("pos"),
        F.try_element_at(parts, F.lit(1)).alias("tok"),
        F.try_element_at(parts, F.lit(2)).alias("tag"),
    ).filter(F.col("tag").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("book").orderBy("pos")
    rows = rows.withColumn(
        "sent_id",
        F.coalesce(
            F.sum(F.col("tok").isin(term).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    if fix_sent_tokenization:
        fixed = F.col("tok")
        for src, dst in BOOK_TOKEN_FIXES.items():
            fixed = F.when(F.col("tok") == src, F.lit(dst)).otherwise(fixed)
        rows = rows.withColumn("tok", fixed)
    return (
        rows.groupBy("book", "sent_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "tok", "tag"))
            ).alias("z")
        )
        .select(
            "book",
            "sent_id",
            F.transform("z", lambda s: s["tok"]).alias("tokens"),
            F.transform("z", lambda s: s["tag"]).alias("tags"),
        )
    )


def spans_from_tag_table(tag_rows: DataFrame) -> DataFrame:
    """Corpus-level BIO-run decoding (W3): (book, start_idx, end_idx, tag)
    golden spans from a (book, pos, tag) table.

    Run-id window trick: a new entity group starts at every tag that is
    not ``I-*`` (mirrors utils.py:130 — only the I- prefix extends a run,
    even across classes); groups whose first tag is 'O' are dropped.
    ``I-`` after 'O' starts a run (resolve_inconsistencies=True,
    utils.py:147-153, which conlleval/seqeval also apply)."""
    from pyspark.sql import Window

    w = Window.partitionBy("book").orderBy("pos")
    # a run starts at any non-I tag, and (resolve_inconsistencies) at an
    # I- that follows 'O' or begins the stream
    runs2 = tag_rows.withColumn(
        "prev_tag", F.lag("tag").over(w)
    ).withColumn(
        "is_start",
        (
            (~F.col("tag").startswith("I-"))
            | (F.col("prev_tag") == "O")
            | F.col("prev_tag").isNull()
        ).cast("long"),
    ).withColumn("run_id", F.sum("is_start").over(w))
    return (
        runs2.groupBy("book", "run_id")
        .agg(
            F.min("pos").alias("start_idx"),
            F.max("pos").alias("end_idx"),
            F.min_by("tag", "pos").alias("first_tag"),
        )
        .filter(F.col("first_tag") != "O")
        .select(
            "book",
            "start_idx",
            "end_idx",
            F.substring("first_tag", 3, 99).alias("tag"),
        )
    )
