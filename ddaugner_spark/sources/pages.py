"""Common-Crawl-style pages table (BASELINE.json input_hint:
``url string, warc_ts timestamp, html binary, text string, lang string``).

``synthesize_pages`` deterministically lifts the driver's ``documents``
table into that exact shape (no external data; seed-free — every column is
a pure function of the input row), and ``extract_text`` recovers the text
from the raw ``html`` bytes **byte-identically per url** (the input_hint's
per-row invariant).  Both are pure column expressions — whole-stage
codegen end to end, no Python.

At real scale the pages table is an Iceberg table partitioned by
``days(warc_ts)`` + ``bucket(url)``; the Iceberg runtime jar is not in
this sandbox, so `plans.materialize` falls back to parquet with the same
partition columns (import-gated, see plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRE = "<html><head><title>"
_MID = "</title></head><body><p>"
_POST = "</p></body></html>"


def synthesize_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages."""
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id"))
    html_str = F.concat(
        F.lit(_PRE), F.col("source"), F.lit(" "), F.col("doc_id").cast("string"),
        F.lit(_MID), F.col("text"), F.lit(_POST),
    )
    return documents.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def extract_text(html: Column) -> Column:
    """binary html → text, byte-identical to the original per url.

    Pure JVM expressions (decode + substring arithmetic, no regex
    backtracking) so extraction stays inside whole-stage codegen at scale.
    """
    s = F.decode(html, "UTF-8")
    start = F.instr(s, _MID) + F.lit(len(_MID))
    end = F.instr(s, _POST)
    return s.substr(start, end - start)
