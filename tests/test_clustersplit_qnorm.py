"""Round-5 session-10 batch 9: cluster-aware split, quantile
normalization.

Micro-fixtures; corpus-scale engine↔oracle parity pinned by
tools/parity_check.py (q_cluster_split, q_qnorm).
"""

from ddaugner_spark.operators.stats import quantile_normalize
from ddaugner_spark.operators.traindata import cluster_aware_split


def test_cluster_aware_split_no_straddle(spark):
    docs = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    # clusters: (0,1,2) and (10,11); everything else singleton
    comps = spark.createDataFrame(
        [
            ("000000000000", "000000000000"),
            ("000000000001", "000000000000"),
            ("000000000002", "000000000000"),
            ("000000000010", "000000000010"),
            ("000000000011", "000000000010"),
        ],
        ["entity", "component"],
    )
    out = cluster_aware_split(docs, comps).collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(out) == 200
    # every cluster member shares the split of its canonical
    assert (
        by_doc[0].split == by_doc[1].split == by_doc[2].split
    )
    assert by_doc[10].split == by_doc[11].split
    # singletons get their own padded id as canonical
    assert by_doc[42].canonical == "000000000042"
    # both splits occur at ~10% eval over 200 docs (md5-uniform)
    n_eval = sum(1 for r in out if r.split == "eval")
    assert 5 <= n_eval <= 45


def test_cluster_aware_split_deterministic(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    comps = spark.createDataFrame(
        [("000000000001", "000000000000")], ["entity", "component"]
    )
    a = sorted(map(tuple, cluster_aware_split(docs, comps).collect()))
    b = sorted(map(tuple, cluster_aware_split(docs, comps).collect()))
    assert a == b


def test_quantile_normalize_maps_onto_pooled(spark):
    # group a: values 1..4 ; group b: values 101..104 (shifted scale)
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4])] + [
        (10 + i, "b", float(v)) for i, v in enumerate([101, 102, 103, 104])
    ]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    out = {r.id: r for r in quantile_normalize(df, "g", "v", "id").collect()}
    # both groups have identical within-group percentiles, so both map
    # onto the SAME pooled targets — scale drift removed
    for i in range(4):
        assert out[i].norm_c == out[10 + i].norm_c
    # monotone within group
    assert out[0].norm_c < out[1].norm_c < out[3].norm_c
    # pooled targets are actual pooled values (cents)
    pooled_cents = {int(v * 100) for _, _, v in rows}
    assert all(out[i].norm_c in pooled_cents for i in out)


def test_quantile_normalize_single_group_near_identity(spark):
    rows = [(i, "a", float(i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    out = {r.id: r for r in quantile_normalize(df, "g", "v", "id").collect()}
    # with one group, percentile q = avgrank/n maps each value to
    # os(ceil(q*n)) = itself (no ties)
    for i in range(10):
        assert out[i].norm_c == (i + 1) * 100
