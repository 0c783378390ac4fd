"""JSONL training-data export sink.

Every LLM-training pipeline ends by materializing curated documents as
JSON Lines; the line is built with EXPLICIT string arithmetic (concat +
an escape chain) instead of ``to_json`` because the export must be
byte-deterministic across engines and versions — ``to_json``'s spacing
/ key-order / float formatting are engine-private, which is fine for a
sink nobody diffs but wrong for a reproducible corpus artifact (and
untestable against the DuckDB twin).  Map-only whole-stage codegen;
the writer shards by Spark's normal task parallelism.

Escaping covers the JSON string mandatory set actually producible from
a text column: backslash, double quote, newline, CR, tab (order
matters: backslash FIRST).  Cite: reference exports its corpora as
flat per-sentence text files (write_conll — sources/conll.py:83); the
JSONL sink is the document-level analogue for modern trainers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def json_escape(c: Column) -> Column:
    """JSON string-escape ``c`` (backslash first, then the control set)."""
    out = c
    for raw, esc in _ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def to_jsonl(
    docs: DataFrame,
    str_cols: list[str],
    int_cols: list[str],
) -> DataFrame:
    """(doc_id?, line): one deterministic JSON line per row with
    ``int_cols`` emitted raw and ``str_cols`` escaped+quoted (NULL →
    ``null``), keys in the given order — byte-identical in the SQL
    twin."""
    parts: list[Column] = []
    for k in int_cols:
        parts.append(
            F.concat(
                F.lit(f'"{k}":'),
                F.coalesce(F.col(k).cast("string"), F.lit("null")),
            )
        )
    for k in str_cols:
        parts.append(
            F.concat(
                F.lit(f'"{k}":'),
                F.coalesce(
                    F.concat(F.lit('"'), json_escape(F.col(k)), F.lit('"')),
                    F.lit("null"),
                ),
            )
        )
    line = F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))
    return docs.select(*int_cols, line.alias("line"))


def write_jsonl(df: DataFrame, path: str, line_col: str = "line") -> None:
    """Text sink: one JSON line per row."""
    df.select(F.col(line_col).alias("value")).write.mode("overwrite").text(path)
