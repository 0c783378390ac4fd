"""Canonicalization: connected components by iterative hash-min
(GraphFrames-style) over edge DataFrames.

north_star stage 5.  The reference's per-surface analogue is
``majority_voting`` (/root/reference/ddaugner/utils.py:81-108) —
consolidating all occurrences of a surface to one label; here we
consolidate co-occurring entities into components whose canonical id is
the minimum member (hash-min label propagation).

Algorithm (driver loop, bounded lineage):

    label(v) ← v
    repeat: label(v) ← min(label(v), min over neighbors u of label(u))
    until no label changes

Each iteration is one self-contained join+groupBy stage.  Scale design:

* edges are symmetrized once; both join sides hash-partition on the node
  id, so iterations reuse the same shuffle key;
* lineage is truncated every iteration by a RELIABLE parquet round-trip
  of the (tiny) label table — without truncation the plan doubles per
  iteration and the optimizer blows up around iteration ~15.
  ``localCheckpoint`` is NOT used: it pins blocks to executors, so on a
  real cluster one lost executor kills a 25-iteration job mid-flight
  (and parquet round-trips measured 5-10× faster here — CLAUDE.md);
* convergence is detected by counting changed labels (an accumulator-free
  ``count`` on a boolean filter);
* iteration count is O(graph diameter); hub-and-spoke co-mention graphs
  converge in ≤ log(n) rounds with min-propagation in both directions.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_mention_edges(mentions: DataFrame) -> DataFrame:
    """Undirected distinct edges between entity surfaces co-occurring in
    the same (doc_id, sent_id); a < b normalizes orientation."""
    a = mentions.select("doc_id", "sent_id", F.col("surface").alias("a"))
    b = mentions.select("doc_id", "sent_id", F.col("surface").alias("b"))
    return (
        a.join(b, ["doc_id", "sent_id"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


#: label-table row count above which per-iteration parquet round-trips
#: stop being ~free: below it the per-job overhead dominates (measured
#: k=1 → 3.0 s vs k=3 → 4.3 s on the sf0.1 graph, ~10³ labels, local
#: NVMe), above it write bandwidth dominates and batching iterations
#: between checkpoints amortizes the materialization.
CHECKPOINT_AUTO_THRESHOLD = 2_000_000


def checkpoint_policy(
    n_nodes: int, threshold: int = CHECKPOINT_AUTO_THRESHOLD
) -> int:
    """checkpoint_every for a label table of ``n_nodes`` rows: 1 (eager
    truncation, cheapest per-job path) for small tables, 3 (cache-backed
    batching, write-bandwidth amortized) for large ones."""
    return 1 if n_nodes <= threshold else 3


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    stage_dir: str | None = None,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(entity, component) with component = min entity id reachable.

    Node ids are strings; min is lexicographic, deterministic.
    ``stage_dir`` holds the parquet checkpoints (lineage truncation +
    fault-tolerant restart point); a temp dir by default.  NOTE: the
    returned DataFrame is lazily BACKED by the final checkpoint under
    ``stage_dir`` — when ``stage_dir`` is None the backing temp dir is
    left on disk for the lifetime of the result; pass an explicit
    ``stage_dir`` to control that lifetime (the pipeline does).

    Lineage only needs truncation often enough to keep the optimizer
    happy (the plan roughly 4×'s per iteration from the two joins), not
    every round — the label table is parquet-materialized every
    ``checkpoint_every``-th iteration (A/B-dir crash safety kept) and
    MEMORY-CACHED in between so intermediate iterations compute exactly
    once (a lazy chain would re-run iterations 1..k−1 inside iteration
    k's DAG).  The cache is an intra-loop reuse only: recovery always
    recomputes from the last parquet checkpoint, so nothing is pinned
    to executors the way ``localCheckpoint`` would (CLAUDE.md rule).
    Convergence is checked only at checkpoints, so up to
    ``checkpoint_every − 1`` extra (idempotent, fixed-point) iterations
    may run — label output is identical.

    MEASURED (local[32], sf0.1 co-mention graph, warm): k=1 → 3.0 s,
    k=3+cache → 4.3 s, k=3 lazy (no cache) → 9.0 s.  ``checkpoint_every
    = None`` (default) auto-tunes via :func:`checkpoint_policy` on the
    materialized init label-table row count: k=1 while per-job overhead
    dominates (small tables), k=3 once write bandwidth does.
    """
    spark = edges.sparkSession
    own_dir = stage_dir is None
    if own_dir:
        stage_dir = tempfile.mkdtemp(prefix="ddaugner_cc_")
        # the result stays lazily backed by the final checkpoint, so the
        # dir must outlive this call — but not the process: without this
        # every no-stage_dir caller leaks one /tmp dir per invocation
        import atexit

        atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)

    def _roundtrip(df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(f"{stage_dir}/{name}")
        return spark.read.parquet(f"{stage_dir}/{name}")

    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = _roundtrip(sym.repartition("a"), "sym")

    if max_iter < 1:
        # zero iterations: every node is its own component
        labels = _roundtrip(
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node")),
            "labels_init",
        )
        return labels.select(
            F.col("node").alias("entity"), F.col("label").alias("component")
        )

    # iteration 1 fused into init: with label(v)=v, the first hash-min
    # step is label(v) ← min(v, min neighbor id) — ONE aggregate over
    # the symmetric edge table, no join (saves a full join round)
    labels = _roundtrip(
        sym.groupBy(F.col("a").alias("node")).agg(
            # min("a") is the group key itself (constant per group)
            F.least(F.min("a"), F.min("b")).alias("label")
        ),
        "labels_init",
    )
    if checkpoint_every is None:
        # the init table is already parquet-backed, so the count is a
        # metadata-cheap scan; policy decided once per run
        checkpoint_every = checkpoint_policy(labels.count())
    checkpoint_every = max(1, checkpoint_every)

    final_name = "labels_init"
    n_ckpt = 0
    cached: list[DataFrame] = []
    # `changed` accumulates (OR) across the iterations since the last
    # checkpoint; evaluated only when we materialize.
    changed_any = F.lit(False)
    for _it in range(1, max_iter + 1):
        # (1) hash-min: pull the minimum neighbor label
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == F.col("node2"), "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (changed_any | (F.col("nbr_label") < F.col("label"))).alias("changed"),
        )
        # (2) pointer jumping: label(v) ← label(label(v)).  Min-propagation
        # alone needs O(diameter) rounds (a length-L chain takes L
        # iterations); the jump halves label-chain length each round,
        # giving O(log n) convergence on path-like graphs — the standard
        # hash-min + path-compression hybrid.  `stepped` feeds both
        # sides of the jump self-join (computed twice — measured cheaper
        # than block-manager caching at label-table sizes; the join
        # reads the same parquet checkpoint either way).
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.join(parent, stepped.label == F.col("p_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("new_label"),
                (
                    F.col("changed")
                    | (F.col("p_label") < F.col("label"))
                ).alias("changed"),
            )
        )
        if _it % checkpoint_every == 0 or _it == max_iter:
            # alternate A/B dirs so a crashed write never clobbers the
            # last good checkpoint (restartable at checkpoint granularity)
            final_name = f"labels_{n_ckpt % 2}"
            jumped = _roundtrip(jumped, final_name)
            n_ckpt += 1
            n_changed = jumped.filter(F.col("changed")).count()
            for c in cached:
                c.unpersist()
            cached = []
            labels = jumped.select("node", F.col("new_label").alias("label"))
            changed_any = F.lit(False)
            if n_changed == 0:
                break
        else:
            # cache the (tiny) intermediate label table so the next
            # iteration reads it instead of re-running this one inside
            # its own DAG; carry `changed` forward for the checkpoint
            jumped = jumped.cache()
            cached.append(jumped)
            labels = jumped.select(
                "node", F.col("new_label").alias("label"), "changed"
            )
            changed_any = F.col("changed")

    # drop the intermediates that don't back the returned DataFrame
    # (the final checkpoint stays — it IS the result)
    if own_dir:
        keep = {final_name}
        for name in ("sym", "labels_init", "labels_0", "labels_1"):
            if name not in keep:
                shutil.rmtree(f"{stage_dir}/{name}", ignore_errors=True)
    return labels.select(
        F.col("node").alias("entity"), F.col("label").alias("component")
    )


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite subj/obj to their canonical component ids (broadcast map —
    the component table is |entities|-sized, tiny relative to triples)."""
    comp = F.broadcast(components)
    t = triples.join(
        comp.withColumnRenamed("entity", "subj").withColumnRenamed("component", "subj_canon"),
        "subj",
        "left",
    )
    t = t.join(
        comp.withColumnRenamed("entity", "obj").withColumnRenamed("component", "obj_canon"),
        "obj",
        "left",
    )
    return t.withColumn("subj_canon", F.coalesce("subj_canon", "subj")).withColumn(
        "obj_canon", F.coalesce("obj_canon", "obj")
    )
