"""Per-label exact medoids (operators/embedding.py label_medoids)."""

from ddaugner_spark.operators.embedding import label_medoids


def _emb(spark, rows):
    """rows: (vec_id, label, vector)."""
    return spark.createDataFrame(
        [(v, [float(x) for x in e], l) for v, l, e in rows],
        ["vec_id", "embedding", "label"],
    )


def test_medoid_is_central_member(spark):
    # label 0: points at 0, 1, 10 on a line -> medoid is 1
    # (sums: 0 -> 1+100=101(sq *1e6), 1 -> 1+81, 10 -> 100+81)
    rows = [(0, 0, [0.0]), (1, 0, [0.001]), (2, 0, [0.01])]
    out = {r.label: r for r in label_medoids(_emb(spark, rows)).collect()}
    assert out[0].medoid_vec_id == 1
    # q = 0, 1, 10 -> sum for medoid: (1-0)^2 + (1-10)^2 = 82
    assert out[0].sum_d2 == 82
    assert out[0].n_members == 3


def test_medoid_tie_breaks_to_smaller_id(spark):
    rows = [(5, 1, [0.0]), (7, 1, [0.002])]  # symmetric pair
    out = label_medoids(_emb(spark, rows)).collect()[0]
    assert out.medoid_vec_id == 5


def test_singleton_label(spark):
    rows = [(9, 2, [0.5])]
    out = label_medoids(_emb(spark, rows)).collect()[0]
    assert (out.medoid_vec_id, out.sum_d2, out.n_members) == (9, 0, 1)
