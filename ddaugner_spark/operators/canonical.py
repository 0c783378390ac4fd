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


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    stage_dir: str | None = None,
    checkpoint_every: int = 3,
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
    every round — materializing every ``checkpoint_every``-th iteration
    recovers most of the per-iteration parquet cost while keeping the
    A/B-dir crash safety.  Convergence is checked only at checkpoints,
    so up to ``checkpoint_every − 1`` extra (idempotent, fixed-point)
    iterations may run — label output is identical.
    """
    spark = edges.sparkSession
    own_dir = stage_dir is None
    stage_dir = stage_dir or tempfile.mkdtemp(prefix="ddaugner_cc_")
    checkpoint_every = max(1, checkpoint_every)

    def _roundtrip(df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(f"{stage_dir}/{name}")
        return spark.read.parquet(f"{stage_dir}/{name}")

    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = _roundtrip(sym.repartition("a"), "sym")

    labels = _roundtrip(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        "labels_init",
    )
    if max_iter < 1:
        # zero iterations: every node is its own component
        return labels.select(
            F.col("node").alias("entity"), F.col("label").alias("component")
        )

    final_name = "labels_init"
    n_ckpt = 0
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
        # hash-min + path-compression hybrid.
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
            labels = jumped.select("node", F.col("new_label").alias("label"))
            changed_any = F.lit(False)
            if n_changed == 0:
                break
        else:
            # carry `changed` forward lazily inside the label table; the
            # next iteration ORs into it and the next checkpoint counts it
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
