"""Unit tests for session-12 batch 2: Spearman rank correlation, kNN
majority-vote classification, magic-byte MIME sniffing, and the
golden-record survivorship merge."""

import pytest

from pyspark.sql import functions as F

from ddaugner_spark.operators import er, multimodal, similarity, stats


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 35), (4, 99)], ["x", "y"])
    r = stats.spearman_corr(df, "x", "y").collect()[0]
    assert r["n"] == 4 and r["rho"] == 1.0


def test_spearman_anti_monotone(spark):
    df = spark.createDataFrame([(1, 9), (2, 5), (3, 1)], ["x", "y"])
    assert stats.spearman_corr(df, "x", "y").collect()[0]["rho"] == -1.0


def test_spearman_ties_average_rank(spark):
    # x = (1,1,2), y = (1,2,3): doubled ranks x → (3,3,5)... wait:
    # 2·avgrank: x=1 twice → 2·1.5=3 each; x=2 → 6. y distinct → 2,4,6.
    # pearson((3,3,6),(2,4,6)) = 0.866025
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], ["x", "y"])
    r = stats.spearman_corr(df, "x", "y").collect()[0]
    assert r["rho"] == pytest.approx(0.866025, abs=1e-6)


def test_spearman_degenerate_sentinel(spark):
    df = spark.createDataFrame([(1, 5), (1, 7)], ["x", "y"])
    assert stats.spearman_corr(df, "x", "y").collect()[0]["rho"] == -9.9


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_knn_majority_and_tiebreak(spark):
    # query 0 at origin-ish; 3 close label-1 vecs, 2 closer label-2 vecs
    # → top5 = {3×1, 2×2} → majority label 1
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.9, 0.1], 1),
        (2, [0.9, 0.0], 1),
        (3, [0.8, 0.1], 1),
        (4, [1.0, 0.1], 2),
        (5, [0.95, 0.0], 2),
        (6, [-1.0, 0.0], 3),
    ]
    out = similarity.knn_classify(_emb_df(spark, rows), [0], k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["query_id"] == 0 and r["true_label"] == 9
    assert r["pred_label"] == 1 and r["n_votes"] == 3


def test_knn_vote_tie_prefers_smaller_label(spark):
    # top-4: two of label 5, two of label 2 → tie → label 2
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.0], 5),
        (2, [0.8, 0.0], 5),
        (3, [0.7, 0.0], 2),
        (4, [0.6, 0.0], 2),
    ]
    r = similarity.knn_classify(_emb_df(spark, rows), [0], k=4).collect()[0]
    assert r["pred_label"] == 2 and r["n_votes"] == 2


def test_mime_sniff_longest_match_and_default(spark):
    # doc_ids 0..6 cycle through jpeg/png/gif/pdf/zip/openxml/none;
    # doc 5's payload head matches BOTH the zip and openxml magics —
    # the longer one must win
    docs = spark.createDataFrame(
        [(i, "body text") for i in range(7)], ["doc_id", "text"]
    )
    media = multimodal.synthesize_media(docs)
    out = {r["mime"]: r for r in multimodal.sniff_mime(media).collect()}
    assert out["application/vnd.openxmlformats"]["n_docs"] == 1
    assert out["application/zip"]["n_docs"] == 1
    assert out["application/octet-stream"]["n_docs"] == 1
    assert "audio/x-riff" not in out  # dictionary entry with no hits is inert
    # jpeg payload = 3 magic bytes + 9 body bytes
    assert out["image/jpeg"]["sum_bytes"] == 12


def test_mime_sniff_skips_textless_docs(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x")], ["doc_id", "text"]
    )
    media = multimodal.synthesize_media(docs)
    assert media.count() == 1


def test_golden_record_policies(spark):
    rows = [
        # cluster 1: newer partial row wins name, older row keeps nation
        (1, 10, 1, "alice", 7, 100),
        (1, 11, 2, "alice jr", None, None),
        # cluster 2: stale row has the higher balance, base wins fields
        (2, 20, 1, "bob", 3, 50),
        (2, 22, 0, None, 4, 550),
    ]
    recs = spark.createDataFrame(
        rows, "cluster_id long, rid long, ts long, name string, "
        "nationkey long, acctbal_c long"
    )
    out = {r["cluster_id"]: r for r in er.golden_record(recs).collect()}
    r1 = out[1]
    assert r1["name"] == "alice jr" and r1["nationkey"] == 7
    assert r1["acctbal_c"] == 100 and r1["n_records"] == 2 and r1["n_names"] == 2
    r2 = out[2]
    assert r2["name"] == "bob" and r2["nationkey"] == 3  # ts=1 beats ts=0
    assert r2["acctbal_c"] == 550 and r2["n_names"] == 1


def test_golden_record_same_ts_tiebreaks_on_rid(spark):
    rows = [
        (1, 10, 1, "a", 1, 1),
        (1, 11, 1, "b", 1, 1),
    ]
    recs = spark.createDataFrame(
        rows, "cluster_id long, rid long, ts long, name string, "
        "nationkey long, acctbal_c long"
    )
    assert er.golden_record(recs).collect()[0]["name"] == "b"


def test_spearman_ignores_incomplete_pairs(spark):
    # regression: ranks must be taken over COMPLETE pairs only — a row
    # with a NULL on one side used to enter the other column's rank map
    # (shifting ranks by a non-uniform gap) and then drop at the join
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (5, 50), (4, None), (None, 60)],
        "x long, y long",
    )
    r = stats.spearman_corr(df, "x", "y").collect()[0]
    assert r["n"] == 4 and r["rho"] == 1.0


def test_golden_record_ts_width_dominates_value_domain(spark):
    # regression: the packed key's ts pad must dominate the ts domain —
    # the old width-2 pad truncated "100" to "10" < "99", silently
    # inverting latest-non-null; width 20 holds any epoch-micros ts
    rows = [
        (1, 1, 99, "old", 1, 1),
        (1, 2, 100, "new", 1, 1),
        # epoch-micros magnitude (16 digits) vs a small ts
        (2, 1, 999, "stale", 1, 1),
        (2, 2, 1_700_000_000_000_000, "fresh", 1, 1),
    ]
    recs = spark.createDataFrame(
        rows, "cluster_id long, rid long, ts long, name string, "
        "nationkey long, acctbal_c long"
    )
    out = {r["cluster_id"]: r["name"] for r in er.golden_record(recs).collect()}
    assert out == {1: "new", 2: "fresh"}
