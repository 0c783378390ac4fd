"""k-means IVF (similarity.ivf_kmeans_topk): recall@10 vs brute force
must be ≥ 0.9 at 64 cells / nprobe=4 (VERDICT round-1 item 10), and the
deterministic centroid construction must be stable across runs.
"""

import pytest

from ddaugner_spark.operators import similarity

QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_recall_at_10_vs_brute_force(spark, emb):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(emb, QIDS, k=10).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_kmeans_topk(emb, QIDS, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_dataframe_query_form_matches_list_form(spark, emb):
    """The production semi-join query form (query_ids as a DataFrame —
    VERDICT r4 #6) returns exactly the list form's rows."""
    from pyspark.sql import functions as F

    by_list = similarity.ivf_kmeans_topk(emb, QIDS, k=10)
    qdf = emb.filter(F.col("vec_id").isin(QIDS)).select("vec_id")
    by_df = similarity.ivf_kmeans_topk(emb, qdf, k=10)
    assert by_list.subtract(by_df).count() == 0
    assert by_df.subtract(by_list).count() == 0


def test_centroids_deterministic(spark, emb):
    a = similarity.kmeans_centroids(emb, n_cells=16, iters=2, dim=64)
    b = similarity.kmeans_centroids(emb.repartition(7), n_cells=16, iters=2, dim=64)
    assert a == b


def test_every_query_gets_k(spark, emb):
    out = similarity.ivf_kmeans_topk(emb, QIDS, k=10)
    counts = {r["query_id"]: r["n"] for r in out.groupBy("query_id").count().withColumnRenamed("count", "n").collect()}
    assert all(counts.get(q, 0) == 10 for q in QIDS)


def test_mention_ann_recall_at_3_vs_brute_force(spark, sf_dir):
    """q_mention_ann_ivf's constants (8 cells, nprobe=6, iters=2, dim=8)
    must keep recall@3 >= 0.9 against the brute-force mention-ANN
    baseline (q_mention_ann stays registered as the exactness oracle —
    VERDICT r3 #3)."""
    import __spark_entry__ as E

    mv = E._mention_vecs(spark, sf_dir)
    mv = mv.cache()
    qids = [r["vec_id"] for r in mv.filter("tag = 'PER'").select("vec_id").collect()]
    assert qids, "no PER mention surfaces in the corpus"
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(mv, qids, k=3).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_kmeans_topk(
            mv, qids, k=3, n_cells=8, nprobe=6, iters=2, dim=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_quantized_recall_vs_float(spark, emb):
    """int8 quantization must not disturb the neighborhood structure:
    recall@10 vs the float32 exact baseline >= 0.9, and every quantized
    component stays in [-127, 127]."""
    import pyspark.sql.functions as F

    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(emb, QIDS, k=10).collect()
    }
    quant = {
        (r["query_id"], r["vec_id"])
        for r in similarity.quantized_topk(emb, QIDS, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall
    q = similarity.quantize_embeddings(emb)
    mx = q.select(
        F.max(F.array_max(F.transform("qvec", lambda x: F.abs(x)))).alias("m")
    ).collect()[0]["m"]
    assert mx <= 127


def test_simplified_silhouette_numpy_replay(spark, emb):
    """Per-cell means must equal a numpy replay of the definition from
    the SAME deterministic centroids (assignment = rank-1 of the
    8-digit-rounded squared-L2 with cell tiebreak, s = (√b−√a)/max)."""
    import numpy as np

    n_cells, iters = 16, 2
    cents = similarity.kmeans_centroids(emb, n_cells=n_cells, iters=iters, dim=64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    rows = emb.select("vec_id", "embedding").collect()
    per_cell = {}
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        d2 = np.round(((x - C) ** 2).sum(axis=1), 8)
        order = sorted(range(len(cents)), key=lambda i: (d2[i], cents[i][0]))
        a, b = np.sqrt(d2[order[0]]), np.sqrt(d2[order[1]])
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        per_cell.setdefault(cents[order[0]][0], []).append(s)
    got = {
        r["cell"]: (r["n"], r["mean_silhouette"])
        for r in similarity.simplified_silhouette(
            emb, n_cells=n_cells, iters=iters
        ).collect()
    }
    want = {c: (len(v), round(sum(v) / len(v), 6)) for c, v in per_cell.items()}
    assert set(got) == set(want)
    for c in want:
        assert got[c][0] == want[c][0]
        assert abs(got[c][1] - want[c][1]) <= 1e-6, (c, got[c], want[c])


def test_simplified_silhouette_separated_blobs(spark):
    """Two far-apart tight blobs with k=2 → mean silhouette ≈ 1 in both
    cells; the score range invariant holds."""
    rows = []
    for i in range(20):
        base = 0.0 if i < 10 else 100.0
        rows.append((i, [base + 0.01 * (i % 10)] + [0.0] * 63))
    emb2 = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = similarity.simplified_silhouette(emb2, n_cells=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["n"] == 10
        assert 0.9 <= r["mean_silhouette"] <= 1.0


def test_kcenter_numpy_replay_and_spread(spark, emb):
    """Exact numpy replay of the farthest-point rounds; the farthest
    distance is non-increasing (min-dist to a growing set shrinks
    pointwise); seed = min vec_id."""
    import numpy as np

    k = 6
    got = [
        (r["rank"], r["vec_id"], r["dist"])
        for r in similarity.kcenter_select(emb, k=k).collect()
    ]
    got.sort()
    rows = sorted(
        ((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
         for r in emb.select("vec_id", "embedding").collect()),
    )
    ids = [v for v, _ in rows]
    X = np.stack([x for _, x in rows])
    chosen = [0]  # index of min vec_id
    want = [(0, ids[0], 0.0)]
    for r in range(1, k):
        d2 = np.round(
            ((X[:, None, :] - X[None, chosen, :]) ** 2).sum(axis=2), 8
        ).min(axis=1)
        best = min(range(len(ids)), key=lambda i: (-d2[i], ids[i]))
        if d2[best] <= 0:
            break
        chosen.append(best)
        want.append((r, ids[best], round(float(d2[best]), 6)))
    assert got == want
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)
