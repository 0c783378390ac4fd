"""PII redaction over the document corpus: detect and mask emails, IPv4
addresses, international phone numbers, and long ID-like digit runs.

Training-data-pipeline operator (engine addition; web crawls are
scrubbed before model training).  Pure column expressions — a fixed
chain of ``regexp_replace`` / ``regexp_extract_all`` calls, entirely
map-only: no shuffle, no UDF, whole-stage codegen end to end, and the
filter/projection still push down to the parquet scan.

The patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no lookaround, no backrefs — character classes,
bounded repetition, and ASCII word boundaries only, so both engines
match identical spans.  Replacement ORDER is part of the contract:
emails first (their local part may contain digits), then dotted IPv4
(before the bare-digit-run rule can eat an octet sequence), then phone
numbers, then bare ID runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pattern, placeholder — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phones", r"\+\d{10,15}", "[PHONE]"),
    ("ids", r"\b\d{9,}\b", "[ID]"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_ids, clean_text) — per-doc
    PII category counts plus the masked text.  Counts are taken on the
    progressively-redacted string, so a span consumed by an earlier rule
    is not double-counted by a later one (an IPv4 inside an email's
    domain counts once, as the email)."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out_cols = [F.col("doc_id")]
    for name, pat, placeholder in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, placeholder)
    out_cols.append(cur.alias("clean_text"))
    return docs.select(*out_cols)
