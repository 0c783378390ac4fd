"""Deterministic stratified sampling — training-data mixture
construction over a document corpus.

Not in the reference (its corpora are hand-assembled file lists); this
is the standard "mixture weights" stage of a web-scale pretraining
pipeline: each stratum (language, source domain, quality band …) is
downsampled to a target rate, deterministically, so the same corpus
always yields the same mixture regardless of partitioning, resume, or
cluster size (CLAUDE.md determinism rule: every random choice is a pure
function of row identity).

The sampling key is md5 of the row id — uniform, engine-exact on the
DuckDB oracle side via the established ``F.conv(hex,16,10)`` ↔
``('0x'||hex)::UBIGINT`` pairing.  A row is sampled iff its bucket
(0..999) falls below the stratum's per-mille rate, so rates are exact
to 1/1000 in expectation and reproducible row-by-row.

Shape at scale: the filter is a narrow map over the scan (predicate
pushdown keeps untouched columns pruned); no shuffle until the caller
aggregates.  The per-mille threshold is a literal CASE over the stratum
column — no join against a rate table needed below ~thousands of
strata (broadcast-join a rate dimension beyond that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_bucket(id_col: str = "doc_id") -> Column:
    """Deterministic bucket 0..999 from md5 of the row id (first 4 hex
    digits → 0..65535, mod 1000; the ~6.5% modulo bias across buckets is
    irrelevant at per-mille granularity and documented here)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 1000
    )


def stratified_sample(
    docs: DataFrame,
    rates_mille: dict[str, int],
    default_mille: int = 0,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``docs`` whose bucket falls under their stratum's
    per-mille rate.  ``rates_mille`` maps stratum value → kept rows per
    1000 (e.g. ``{"en": 600, "de": 300}``); unlisted strata use
    ``default_mille`` (0 = dropped)."""
    rate = F.lit(default_mille)
    for k in sorted(rates_mille, reverse=True):
        rate = F.when(F.col(strat_col) == k, F.lit(rates_mille[k])).otherwise(rate)
    return docs.filter(sample_bucket(id_col) < rate)


def mixture_summary(
    docs: DataFrame,
    rates_mille: dict[str, int],
    default_mille: int = 0,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(stratum, n_docs, n_sampled, sum_sampled_ids, target_mille) — the
    realized mixture next to its target.  ``sum_sampled_ids`` makes the
    row membership-sensitive: any divergence in WHICH rows were kept
    (not just how many) breaks the hash match against the oracle."""
    sampled = F.col("bucket") < F.col("target_mille")
    rate = F.lit(default_mille)
    for k in sorted(rates_mille, reverse=True):
        rate = F.when(F.col(strat_col) == k, F.lit(rates_mille[k])).otherwise(rate)
    with_key = docs.select(
        F.col(strat_col).alias("stratum"),
        F.col(id_col).alias("rid"),
        sample_bucket(id_col).alias("bucket"),
        rate.alias("target_mille"),
    )
    return (
        with_key.groupBy("stratum", "target_mille")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sampled.cast("long")).alias("n_sampled"),
            F.sum(F.when(sampled, F.col("rid")).otherwise(F.lit(0)))
            .cast("long")
            .alias("sum_sampled_ids"),
        )
        .select(
            "stratum",
            "n_docs",
            "n_sampled",
            "sum_sampled_ids",
            F.col("target_mille").cast("long").alias("target_mille"),
        )
    )
