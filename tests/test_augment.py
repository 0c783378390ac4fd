"""Augmentation laws — same invariants the reference pins
(tests/test_conll.py:37-133), deterministic versions."""

import pyspark.sql.functions as F

from ddaugner_spark.operators import augment, mentions


def test_standard_adds_sentences(spark, docs):
    """standard augmentation adds ≈ freq·n new rows and keeps originals
    (test_conll.py:37-53)."""
    n = docs.count()
    out = augment.augment_standard(docs, freq=0.2)
    assert out.filter(~F.col("augmented")).count() == n
    added = out.filter(F.col("augmented")).count()
    assert 0 < added <= n * 0.25


def test_replace_preserves_count_changes_content(spark, docs):
    """replace keeps the row count and changes selected rows' content
    (test_conll.py:90-133)."""
    out = augment.augment_replace(docs, ratio=0.5)
    assert out.count() == docs.count()
    changed = (
        out.join(docs.select("doc_id", F.col("text").alias("orig")), "doc_id")
        .filter(F.col("augmented") & (F.col("text") != F.col("orig")))
        .count()
    )
    # every selected doc containing a PER mention changed
    assert changed > 0


def test_balance_restores_ratios(spark, docs, tmp_path):
    """balance_upsample moves post-augmentation class ratios back toward
    the pre-augmentation ratios (test_conll.py:72-88, 3-decimal law
    relaxed: upsampling granularity is whole documents here, sentences in
    the reference)."""
    small = docs.limit(200)
    pre = {
        r["tag"]: r["n"]
        for r in mentions.mentions_df(small).groupBy("tag").agg(F.count("*").alias("n")).collect()
    }
    pre_total = sum(pre.values())

    # materialize compositions before re-running mention detection over
    # them (CLAUDE.md: parquet round-trips between stages; the mention
    # fold re-evaluates an unmaterialized injection expression per window)
    d = str(tmp_path)  # pytest-owned, removed automatically
    augment.augment_standard(small, freq=0.3).write.mode("overwrite").parquet(
        f"{d}/plain"
    )
    plain = spark.read.parquet(f"{d}/plain")
    corpus, diag = augment.balance_upsample(small, freq=0.3, stage_dir=f"{d}/stage")
    corpus.write.mode("overwrite").parquet(f"{d}/bal")
    corpus = spark.read.parquet(f"{d}/bal")

    def ratios(df):
        rows = mentions.mentions_df(df).groupBy("tag").agg(F.count("*").alias("n")).collect()
        tot = sum(r["n"] for r in rows)
        return {r["tag"]: r["n"] / tot for r in rows}

    want = {t: n / pre_total for t, n in pre.items()}
    drift_plain = sum(abs(ratios(plain).get(t, 0) - w) for t, w in want.items())
    drift_bal = sum(abs(ratios(corpus).get(t, 0) - w) for t, w in want.items())
    assert drift_bal <= drift_plain + 1e-9
    assert any(v > 0 for v in diag["additions"].values()) or drift_plain < 1e-3
