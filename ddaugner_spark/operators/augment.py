"""Gazetteer-injection augmentation, deterministic under parallelism.

Reference semantics being lifted (SURVEY.md §2.9):

* ``LabelWiseNERAugmenter.__call__`` — pick an entity of a class, draw a
  replacement from a gazetteer, replace all pattern occurrences
  (/root/reference/ddaugner/aug.py:94-146 → aug.py:17-37 → aug.py:40-74);
* ``CapitalizationAugmenter`` — upper-case whole sentence
  (/root/reference/ddaugner/aug.py:199-209);
* ``_augment_replace`` — overwrite a deterministic fraction of rows with
  their augmented versions (/root/reference/ddaugner/datas/conll/conll.py:178-236).

The reference uses *unseeded* ``random`` everywhere (SURVEY.md §4.3); a
distributed engine cannot — results must be invariant under
re-partitioning and resume.  Every random draw is replaced by a pure
function of row identity: replacement index =
``(doc_id*7 + start_idx*31) mod |pool|``; the replace-fraction selector is
``pmod(doc_id, m) < m*ratio``.  Both are trivially portable to the oracle.

Scale notes: injection is a narrow per-row array rewrite (transform over
token positions) — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from .mentions import with_bio, _tok, _covered


def inject_gazetteer(docs: DataFrame, pool: list[str] | None = None) -> DataFrame:
    """Replace every unigram PER token with a deterministic pool name.

    Returns (doc_id, n_replaced, new_text).  Multi-token ORG mentions are
    left intact (class-restricted augmentation, aug.py:100-106: a
    LabelWiseNERAugmenter only touches its own class)."""
    pool = pool or config.INJECT_NAMES
    df = with_bio(docs)
    n = F.col("n_tokens")
    seq1 = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # O(1) per-position predicate (see mentions._is_big_start: lambda
    # bodies must not reference computed array columns)
    is_per = lambda i: _tok(i).isin(config.PER_WORDS) & ~_covered(i, n)  # noqa: E731
    pool_arr = F.array(*[F.lit(p) for p in pool])
    repl = lambda i: F.element_at(  # noqa: E731
        pool_arr,
        (
            F.pmod(F.col("doc_id") * 7 + i.cast("long") * 31, F.lit(len(pool))) + 1
        ).cast("int"),
    )
    new_tokens = F.transform(seq1, lambda i: F.when(is_per(i), repl(i)).otherwise(_tok(i)))
    n_replaced = F.size(F.filter(seq1, is_per))
    return df.select(
        "doc_id",
        n_replaced.cast("long").alias("n_replaced"),
        F.array_join(new_tokens, " ").alias("new_text"),
    )


def capitalization_augment(docs: DataFrame) -> DataFrame:
    """Upper-case augmentation (aug.py:199-209); ``changed`` mirrors the
    reference returning None when the text was already upper-case."""
    return docs.select(
        "doc_id",
        F.upper("text").alias("new_text"),
        (F.upper("text") != F.col("text")).alias("changed"),
    )


def augment_replace(docs: DataFrame, ratio: float = 0.5, modulus: int = 100) -> DataFrame:
    """_augment_replace (conll.py:178-236): overwrite a deterministic
    ``ratio`` of rows with their injected version, keep the rest.

    Selector is pmod(doc_id, modulus) < modulus*ratio — stable under
    re-partitioning (replaces the reference's random.shuffle of indices,
    conll.py:217)."""
    k = int(modulus * ratio)
    injected = inject_gazetteer(docs).select("doc_id", F.col("new_text").alias("aug_text"))
    return (
        docs.join(injected, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.pmod(F.col("doc_id"), F.lit(modulus)) < k, F.col("aug_text"))
            .otherwise(F.col("text"))
            .alias("text"),
            (F.pmod(F.col("doc_id"), F.lit(modulus)) < k).alias("augmented"),
        )
    )
