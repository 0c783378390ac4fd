"""Document embedding generation + embedding-space near-duplicate search.

Training-data pipelines embed documents to dedup/cluster them before
NER.  Real encoders are not in this container; the featurizer here is a
**hashed signed-count embedding** (feature-hashing): dimension j is the
sum over distinct tokens of ±1 decided by hex digit j of md5(token).
Properties that matter for the engine:

* integer arithmetic end-to-end → the DuckDB oracle matches exactly
  (no float-summation-order hazard);
* same locality behavior as simhash (near-identical token sets →
  near-identical vectors), so cosine near-dup search over it is a
  faithful stand-in for encoder embeddings;
* pure column expressions — the featurizer is map-only and the swap
  point for a real encoder is a mapInPandas batch (same schema).

Pair search uses BANDED sign-LSH (random-hyperplane LSH with
OR-amplification): the full sign vector is split into ``N_BANDS``
disjoint bands and candidates are pairs agreeing exactly on ≥1 band,
then verified with exact cosine over the integer vectors.  A single
fixed 6-bit prefix (round 1) capped the corpus at 64 buckets — an
intra-bucket quadratic self-join at scale; banding keeps per-bucket
populations shrinkable (raise ``dims``/band width with corpus size) and
its recall is the standard 1-(1-s^r)^b curve instead of one prefix roll.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: SCALE-SAFE defaults: 64 sign dims split into 8 disjoint 8-bit bands.
#: At a 0.95-cosine threshold the per-hyperplane agreement probability
#: is ~0.9, so 8-bit bands hit ~0.43 each and 8 OR'd bands give ~0.99
#: recall with 256 buckets per band; corpus growth scales by ADDING
#: bands/dims (more tables), not by widening bands past the threshold's
#: operating point.  The 16/4 configuration survives only inside the
#: oracle queries, whose SQL twins are written for it.
EMBED_DIMS = 64
N_BANDS = 8


def hashed_doc_embeddings(docs: DataFrame, dims: int = EMBED_DIMS) -> DataFrame:
    """(doc_id, v_0..v_{dims-1} int, norm_sq long) — signed-count hashed
    embedding over distinct tokens.  One md5 yields 32 hex digits;
    dimensions ≥ 32 draw from md5('<k>|' || token), k = j // 32 (same
    keyed-hash extension as simhash — oracle-reproducible)."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    )
    for k in range((dims + 31) // 32):
        col = F.md5(F.col("tok")) if k == 0 else F.md5(
            F.concat(F.lit(f"{k}|"), F.col("tok"))
        )
        toks = toks.withColumn(f"h{k}", col)
    aggs = [
        F.sum(
            F.when(
                F.substring(F.col(f"h{j // 32}"), j % 32 + 1, 1).isin(
                    list("89abcdef")
                ),
                1,
            ).otherwise(-1)
        )
        .cast("long")
        .alias(f"v_{j}")
        for j in range(dims)
    ]
    out = toks.groupBy("doc_id").agg(*aggs)
    norm_sq = sum(F.col(f"v_{j}") * F.col(f"v_{j}") for j in range(dims))
    return out.withColumn("norm_sq", norm_sq.cast("long"))


def _band_key(band: int, dims: int, n_bands: int) -> Column:
    w = dims // n_bands
    lo = band * w
    hi = dims if band == n_bands - 1 else lo + w
    return F.concat(
        *[
            F.when(F.col(f"v_{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(lo, hi)
        ]
    )


def embedding_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.95,
    dims: int = EMBED_DIMS,
    n_bands: int = N_BANDS,
    ndigits: int = 4,
) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ threshold; candidates = pairs whose
    sign vectors agree exactly on ≥1 of ``n_bands`` disjoint bands
    (random-hyperplane LSH, OR-amplified), verified with exact cosine."""
    emb = hashed_doc_embeddings(docs, dims)
    bands = emb.select(
        "doc_id",
        "norm_sq",
        *[F.col(f"v_{j}") for j in range(dims)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        _band_key(k, dims, n_bands).alias("bkey"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "norm_sq", *[f"v_{j}" for j in range(dims)], "bk.band_id", "bk.bkey")
    a = bands.select(
        "band_id",
        "bkey",
        F.col("doc_id").alias("a"),
        F.col("norm_sq").alias("na"),
        *[F.col(f"v_{j}").alias(f"a_{j}") for j in range(dims)],
    )
    b = bands.select(
        "band_id",
        "bkey",
        F.col("doc_id").alias("b"),
        F.col("norm_sq").alias("nb"),
        *[F.col(f"v_{j}").alias(f"b_{j}") for j in range(dims)],
    )
    dot = sum(F.col(f"a_{j}") * F.col(f"b_{j}") for j in range(dims))
    return (
        a.join(b, ["band_id", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "na", "nb", *[f"a_{j}" for j in range(dims)], *[f"b_{j}" for j in range(dims)])
        .distinct()  # a close pair can collide in several bands
        .withColumn(
            "cos",
            dot.cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", ndigits).alias("cos"))
    )


def semantic_dedup(
    vectors: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    tau: float = 0.95,
    dim: int = EMBED_DIMS,
    ndigits: int = 6,
) -> DataFrame:
    """(vec_id, cell, kept) — SemDeDup-style semantic deduplication
    (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding space
    with the deterministic k-means coarse quantizer, then WITHIN each
    cluster drop every vector that has a lower-``vec_id`` neighbor with
    cosine ≥ ``tau`` (the paper keeps one representative per semantic
    near-duplicate group; lowest-id is the deterministic choice — pure
    row identity, survives repartition).

    ``vectors``: (vec_id, embedding array) — e.g. hashed doc embeddings
    packed to an array, or encoder vectors.

    Scale shape: the clustering is the whole point — candidate pairs
    are generated per CELL (one equi-join on cell id), never across the
    corpus, so the quadratic term is bounded by the largest cluster;
    ``n_cells`` grows with the corpus to hold cluster sizes roughly
    constant (the paper's regime), keeping per-cell work flat while the
    cell join shuffles on a key with n_cells-way spread.  Assignment is
    the map-only literal-centroid pass (similarity._nearest_cells — no
    join, no crossJoin); the drop set is |near-dup|-sized and
    anti-joined back.  Integer-valued embeddings make every cosine
    exact (sums of int products in double), so the rounded τ-comparison
    is engine-reproducible bit-for-bit.
    """
    from ddaugner_spark.operators.similarity import (
        _nearest_cells,
        cosine,
        kmeans_centroids,
    )

    cents = kmeans_centroids(vectors, n_cells=n_cells, iters=iters, dim=dim)
    assigned = vectors.withColumn(
        "cell", F.element_at(_nearest_cells(F.col("embedding"), cents, 1), 1)
    )
    a = assigned.select(
        "cell", F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    b = assigned.select(
        "cell", F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    drops = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .filter(F.round(cosine(F.col("ea"), F.col("eb")), ndigits) >= tau)
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(drops.withColumn("_drop", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.col("_drop").isNull().alias("kept"),
        )
    )


def jl_project(
    emb: DataFrame, out_dim: int = 16, scale: int = 1000
) -> DataFrame:
    """Quantized Johnson–Lindenstrauss random projection: d-dim float
    embeddings down to ``out_dim`` via a deterministic Rademacher ±1
    matrix (md5 bit of (i, j)), with inputs quantized to 1/scale so
    every output coordinate is ONE exact integer dot product — the
    engine's standard device for order-free float parity (same idea as
    the int8 quantized ANN path, similarity.py).

    out_j = (Σ_i round(e_i·scale)·sign(i,j)) / scale / sqrt(out_dim).
    Plan: posexplode to (vec, i, q), ×out_dim arithmetic fan-out,
    hash-aggregate back to (vec, j) — shuffle rows = vecs·out_dim, the
    OUTPUT size.  At production scale the same contract runs as a
    single numpy matmul inside mapInPandas; this formulation is the
    oracle-replayable twin that pins it.
    """
    norm = float(out_dim) ** 0.5
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("v").cast("double") * scale).cast("long").alias("q"),
    )
    fan = el.select(
        "vec_id",
        "i",
        "q",
        F.explode(F.sequence(F.lit(0), F.lit(out_dim - 1))).alias("j"),
    )
    bit = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.col("i"), F.col("j"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 2
    )
    out = fan.groupBy("vec_id", "j").agg(
        F.sum((bit * 2 - 1) * F.col("q")).cast("long").alias("num")
    )
    return out.select(
        "vec_id",
        F.col("j").cast("long").alias("j"),
        F.round(F.col("num") / float(scale) / norm, 6).alias("value"),
    )


def label_medoids(emb: DataFrame, scale: int = 1000) -> DataFrame:
    """Exact 1-medoid per label: the member minimizing the sum of
    squared L2 distances to its label-mates — the REPRESENTATIVE
    selection a curation/inspection pass wants where label_centroids'
    mean vector is not an actual member.

    Determinism device: coordinates quantize to 1/scale (the jl_project
    / quantized-ANN idiom), so every pairwise squared distance and its
    per-member sum are exact integers; the argmin is the packed
    lpad(sum)#lpad(vec_id) min-key (ties → smallest id).  Plan: one
    posexplode, one within-label dimension-aligned self-join (quadratic
    ONLY in label size — the grouped-quadratic shape of semantic_dedup's
    per-cell verify), one hash aggregate per (label, member), a
    label-sized argmin.  Singleton labels yield themselves with
    sum_d2 = 0.  Returns (label, medoid_vec_id, sum_d2, n_members).
    """
    el = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "v")
    ).select(
        "vec_id",
        "label",
        "i",
        F.round(F.col("v").cast("double") * scale).cast("long").alias("q"),
    )
    a = el.select(
        "label", "i", F.col("vec_id").alias("a"), F.col("q").alias("qa")
    )
    b = el.select(
        "label", "i", F.col("vec_id").alias("b"), F.col("q").alias("qb")
    )
    dq = F.col("qa") - F.col("qb")
    tot = (
        a.join(b, ["label", "i"])
        .filter(F.col("a") != F.col("b"))
        .groupBy("label", "a")
        .agg(F.sum(dq * dq).cast("long").alias("sum_d2"))
    )
    key = F.concat_ws(
        "#",
        F.lpad(F.col("sum_d2").cast("string"), 19, "0"),
        F.lpad(F.col("a").cast("string"), 19, "0"),
    )
    best = (
        tot.select("label", key.alias("k"))
        .groupBy("label")
        .agg(F.min("k").alias("k"))
        .select(
            "label",
            F.split("k", "#").getItem(1).cast("long").alias("medoid_vec_id"),
            F.split("k", "#").getItem(0).cast("long").alias("sum_d2"),
        )
    )
    nm = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("vec_id").cast("long").alias("min_id"),
    )
    multi = best.join(F.broadcast(nm), "label").select(
        "label", "medoid_vec_id", "sum_d2", "n_members"
    )
    singles = nm.filter(F.col("n_members") == 1).select(
        "label",
        F.col("min_id").alias("medoid_vec_id"),
        F.lit(0).cast("long").alias("sum_d2"),
        "n_members",
    )
    return multi.unionByName(singles)


def power_iteration_pca(
    emb: DataFrame,
    iters: int = 3,
    scale: int = 1000,
    ndigits: int = 6,
) -> DataFrame:
    """Dominant principal direction of the embedding cloud by INTEGER
    power iteration: ``(dim, v, lam)`` — the top eigenvector of the
    (uncentered) Gram matrix ΣxxT, components scaled to max |v| =
    ``scale``, plus the Rayleigh-quotient eigenvalue estimate.  The
    drift/whitening direction an embedding-quality monitor tracks; a
    cloud whose top component explains almost everything has collapsed.

    Exactness end-to-end: vectors quantize to integer milli-units, the
    Gram matrix is an exact integer table, and after every iteration
    the vector is RE-QUANTIZED to integers (round(w·scale/max|w|)), so
    matrix-vector products never accumulate floats — both engines walk
    the identical integer sequence; the two final divisions render lam.

    Scale shape: ONE self-join of the exploded (vec, dim, q) table on
    vec_id (map-side combinable into the dim²-sized Gram aggregate);
    every iteration is a join+groupBy on the dim²-row Gram table and a
    dim-row vector — driver never holds data, plan is constant-size in
    the corpus.  Uncentered by design: centering would float the Gram
    entries; run it on residuals if a mean-free direction is needed.
    """
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("i"),
        F.round(F.col("x").cast("double") * scale).cast("long").alias("q"),
    )
    a = el.select("vec_id", F.col("i"), F.col("q"))
    b = el.select(
        "vec_id", F.col("i").alias("j"), F.col("q").alias("qb")
    )
    cov = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("qb")).alias(
                "c"
            )
        )
    )
    spark = emb.sparkSession
    dims = emb.select(F.max(F.size("embedding"))).first()[0]
    v = spark.range(1, dims + 1).select(
        F.col("id").alias("j"), F.lit(scale).cast("long").alias("v")
    )
    for _ in range(iters):
        w = (
            cov.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("wi"))
        )
        m = w.agg(F.max(F.abs(F.col("wi"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("j"),
                F.round(
                    F.col("wi").cast("double")
                    * scale
                    / F.col("m").cast("double")
                )
                .cast("long")
                .alias("v"),
            )
        )
    vi = v.select(F.col("j").alias("i"), F.col("v").alias("vi"))
    vj = v.select("j", F.col("v").alias("vj"))
    num = (
        cov.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .agg(
            F.sum(F.col("c") * F.col("vi") * F.col("vj")).alias("num")
        )
    )
    vv = v.agg(
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("vv")
    )
    lam = num.crossJoin(vv).select(
        F.round(
            F.col("num").cast("double") / F.col("vv").cast("double"),
            ndigits,
        ).alias("lam")
    )
    return v.crossJoin(F.broadcast(lam)).select(
        F.col("j").alias("dim"), "v", "lam"
    )
