"""Session-9 batch 8: co-engagement projection (events.coengagement),
label centroids + nearest-centroid confusion (similarity), KS
two-sample test and Gini coefficient (regression)."""

import datetime as dt

import pytest

from ddaugner_spark.operators import regression, similarity
from ddaugner_spark.operators import events as evops


def _ev(spark, rows):
    data = [(i, dt.datetime(2024, 1, 1), u, et, float(v))
            for i, (u, et, v) in enumerate(rows)]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double",
    )


def test_coengagement(spark):
    e = _ev(spark, [(1, "view", 0), (1, "click", 0), (1, "view", 0),
                    (2, "view", 0), (2, "purchase", 0),
                    (3, "view", 0)])
    got = {(r["t1"], r["t2"]): r["n_users"]
           for r in evops.coengagement(e).collect()}
    assert got == {("click", "view"): 1, ("purchase", "view"): 1}


def test_label_centroids_and_confusion(spark):
    # two well-separated labels in 2-d; one vector closer to the wrong side
    rows = [
        (0, [0.0, 0.0], "a"), (1, [0.2, 0.0], "a"), (2, [0.0, 0.2], "a"),
        (3, [5.0, 5.0], "b"), (4, [5.2, 5.0], "b"),
        (5, [4.9, 4.9], "a"),  # mislabeled -> predicted b
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    cent = {(r["label"], r["dim"]): r["mean"]
            for r in similarity.label_centroids(emb).collect()}
    # label a centroid includes the outlier: mean of [0,.2,0,4.9]=1.275
    assert cent[("a", 0)] == pytest.approx(1.275)
    assert cent[("b", 1)] == pytest.approx(5.0)
    conf = {(r["true_label"], r["pred_label"]): r["n"]
            for r in similarity.nearest_centroid_confusion(emb).collect()}
    assert conf[("a", "a")] == 3
    assert conf[("a", "b")] == 1        # the planted outlier
    assert conf[("b", "b")] == 2


def test_ks_two_sample(spark):
    # A uniform on {1..4}, B shifted to {3..6}: D peaks at v=2 with
    # F_a=0.5, F_b=0 -> 0.5
    rows = ([(u, "view", v) for u, v in enumerate([1, 2, 3, 4])]
            + [(u, "purchase", v) for u, v in enumerate([3, 4, 5, 6])])
    e = _ev(spark, rows)
    r = regression.ks_two_sample(e, "value", "event_type",
                                 "view", "purchase").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["d_stat"] == pytest.approx(0.5)
    assert r["at_value"] == 2.0


def test_ks_identical_distributions(spark):
    rows = [(u, t, v) for v in (1, 2, 3) for t in ("view", "purchase")
            for u in range(2)]
    e = _ev(spark, rows)
    r = regression.ks_two_sample(e, "value", "event_type",
                                 "view", "purchase").collect()[0]
    assert r["d_stat"] == pytest.approx(0.0)


def test_gini_extremes(spark):
    # perfectly equal: G = 0
    eq = _ev(spark, [(u, "view", 0) for u in range(4) for _ in range(3)])
    r = regression.gini_coefficient(eq, "user_id").collect()[0]
    assert r["gini"] == pytest.approx(0.0)
    assert (r["n_keys"], r["total"]) == (4, 12)
    # maximally concentrated among 4 keys: one key has nearly all
    conc = _ev(spark, [(0, "view", 0)] * 97 + [(1, "view", 0),
                                               (2, "view", 0),
                                               (3, "view", 0)])
    r2 = regression.gini_coefficient(conc, "user_id").collect()[0]
    assert r2["gini"] > 0.7


def test_novelty_scores(spark):
    from ddaugner_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.novelty_scores(docs).collect()}
    # doc 0: grams (a,b,c),(b,c,d) both first here -> novelty 1
    assert got[0]["novelty"] == pytest.approx(1.0)
    # doc 1: (a,b,c) seen in doc 0, (b,c,e) new -> 0.5
    assert (got[1]["n_grams"], got[1]["n_novel"]) == (2, 1)
    assert got[1]["novelty"] == pytest.approx(0.5)
    assert got[2]["novelty"] == pytest.approx(1.0)


def test_burstiness(spark):
    from ddaugner_spark.operators import textstats

    # 'b' bursts (always twice per doc), 'a' never repeats
    docs = spark.createDataFrame(
        [(i, "a b b c") for i in range(6)], "doc_id long, text string"
    )
    got = {r["w"]: r for r in textstats.burstiness(docs, min_df=5).collect()}
    assert got["b"]["adaptation"] == pytest.approx(1.0)
    assert got["a"]["adaptation"] == pytest.approx(0.0)
    assert (got["b"]["cf"], got["b"]["df1"], got["b"]["df2"]) == (12, 6, 6)


def test_hard_negatives_margin_and_violation(spark):
    """Two tight clusters + one planted vector sitting in the other
    cluster: the plant must be a violation (margin < 0) with the other
    label as hard_label; clean vectors have positive margins."""
    from ddaugner_spark.operators.similarity import centroid_hard_negatives

    rows = (
        [(i, [0.0, 0.0], 0) for i in range(4)]
        + [(10 + i, [10.0, 10.0], 1) for i in range(4)]
        + [(99, [9.0, 9.0], 0)]  # labeled 0, sits with cluster 1
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in centroid_hard_negatives(emb).collect()}
    plant = out[99]
    assert plant["is_violation"] and plant["margin"] < 0
    assert plant["hard_label"] == 1
    for i in range(4):
        assert not out[i]["is_violation"] and out[i]["margin"] > 0
        assert not out[10 + i]["is_violation"]
