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
import time

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


#: retained for API compatibility with the retired k=3 branch (below);
#: no longer switches behavior.
CHECKPOINT_AUTO_THRESHOLD = 2_000_000


def checkpoint_policy(
    n_nodes: int, threshold: int = CHECKPOINT_AUTO_THRESHOLD
) -> int:
    """checkpoint_every for a label table of ``n_nodes`` rows — ALWAYS
    1 since round 5.  The round-4 policy batched 3 iterations between
    checkpoints for large tables on the theory that write bandwidth
    would dominate; the 6M-node / 5.9M-edge synthetic measurement
    (VERDICT r4 #7, local[32], quiet box) refuted it:

    * k=1 → **54.4 s**, converged in 6 iterations (6 checkpoints;
      per-iteration walls 6.6-9.2 s, n_changed halving 5.8M → 0 —
      the pointer-jumping payoff: plain hash-min needs ~chain-length
      rounds, measured here at log₂(64) = 6);
    * k=3 → **102.3 s**, 9 iterations: each 3-deep lazy chain costs
      ~29 s ≈ 3× a materialized iteration (the cached intermediates
      still recompute the join work inside one DAG) AND convergence is
      only visible at checkpoints, so a full extra 3-batch runs after
      the fixed point;
    * small graphs agreed already (sf0.1 co-mention table, ~10³
      labels: k=1 → 2.25 s vs k=3 → 3.6-4.1 s).

    Per-iteration parquet materialization is ~2 s of the 7-9 s
    iteration at 6M rows — writes were never the bottleneck; join
    recompute is."""
    return 1


#: label-table row count up to which the per-iteration hash-min join
#: BROADCASTS the label table instead of shuffling the (much larger)
#: symmetric edge table by its join key: the neighbor-min step becomes a
#: map-side broadcast join + partial aggregate, so edges are SCANNED but
#: never exchanged.  Above it, labels are executor-memory-sized and the
#: iteration falls back to the shuffle join (the honest big-graph path —
#: both sides exchange on the node id).  2M string-pair rows ≈ low tens
#: of MB serialized — inside the executor broadcast budget, far outside
#: the driver-collect danger zone.
BROADCAST_AUTO_THRESHOLD = 2_000_000


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    stage_dir: str | None = None,
    checkpoint_every: int | None = None,
    broadcast_labels: bool | None = None,
    stats: dict | None = None,
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

    ``broadcast_labels`` (default auto: n_nodes ≤
    :data:`BROADCAST_AUTO_THRESHOLD`): broadcast the label table into
    the per-iteration hash-min join so the symmetric EDGE table is
    scanned, never exchanged — without it each iteration shuffles all
    edges by the join key (the parquet round-trip that truncates
    lineage also discards any physical partitioning, so the
    "partition once, reuse every iteration" framing does not survive
    materialization; broadcasting sidesteps the exchange entirely for
    every graph whose label table fits executor memory).

    ``stats`` (optional dict) is filled in place with per-iteration
    walls and checkpoint/convergence counters — bench legs record it so
    a wall-time regression is attributable to a specific phase instead
    of re-bisecting the whole loop (VERDICT r4 #2).
    """
    spark = edges.sparkSession
    if stats is None:
        stats = {}
    stats["iters"] = []
    stats["n_checkpoints"] = 0
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

    t0 = time.time()
    from pyspark import StorageLevel

    # the symmetric edge table is loop-INVARIANT: persist it instead of
    # the round-5 parquet round-trip (round 6; guide §1.2 — same shape,
    # one write job fewer; its plan is shallow so no lineage hazard, and
    # MEMORY_AND_DISK spills rather than drops, so every iteration reads
    # the same materialized snapshot).  Iteration checkpoints below stay
    # parquet — the label self-joins quadruple the logical plan per
    # iteration, which only a real lineage cut resets.
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.repartition("a").persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    stats["sym_sec"] = round(time.time() - t0, 3)

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
    # the symmetric edge table, no join (saves a full join round).
    # Persisted, not parquet (round 6): the one count below both
    # materializes it and decides the policies — one job total.
    t0 = time.time()
    labels = (
        sym.groupBy(F.col("a").alias("node")).agg(
            # min("a") is the group key itself (constant per group)
            F.least(F.min("a"), F.min("b")).alias("label")
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_nodes = labels.count()
    stats["n_nodes"] = n_nodes
    if checkpoint_every is None:
        checkpoint_every = checkpoint_policy(n_nodes)
    if broadcast_labels is None:
        broadcast_labels = n_nodes <= BROADCAST_AUTO_THRESHOLD
    checkpoint_every = max(1, checkpoint_every)
    stats["checkpoint_every"] = checkpoint_every
    stats["broadcast_labels"] = bool(broadcast_labels)
    stats["init_sec"] = round(time.time() - t0, 3)

    final_name = "labels_init"
    n_ckpt = 0
    cached: list[DataFrame] = []
    # `changed` accumulates (OR) across the iterations since the last
    # checkpoint; evaluated only when we materialize.
    changed_any = F.lit(False)
    for _it in range(1, max_iter + 1):
        it_t0 = time.time()
        # (1) hash-min: pull the minimum neighbor label.  Small graphs
        # broadcast the label table — edges are scanned map-side, never
        # exchanged; big graphs shuffle both sides on the node id.
        lbl_side = F.broadcast(labels) if broadcast_labels else labels
        neighbor_min = (
            sym.join(lbl_side, sym.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        if broadcast_labels:
            neighbor_min = F.broadcast(neighbor_min)
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
        if broadcast_labels:
            parent = F.broadcast(parent)
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
            stats["n_checkpoints"] = n_ckpt
            n_changed = jumped.filter(F.col("changed")).count()
            for c in cached:
                c.unpersist()
            cached = []
            labels = jumped.select("node", F.col("new_label").alias("label"))
            changed_any = F.lit(False)
            stats["iters"].append(
                {"it": _it, "sec": round(time.time() - it_t0, 3),
                 "ckpt": True, "n_changed": n_changed}
            )
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
            stats["iters"].append(
                {"it": _it, "sec": round(time.time() - it_t0, 3), "ckpt": False}
            )

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


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    stage_dir: str | None = None,
    max_peel_rounds: int = 32,
    max_fix_rounds: int = 32,
    stats: dict | None = None,
) -> DataFrame:
    """(node, scc_id) over a DIRECTED edge table: scc_id = the minimum
    member of the node's strongly connected component.

    Min-label forward/backward peeling (the label-based variant of
    FW-BW / the "coloring" SCC family used by Pregel-style systems):

    * forward fixpoint  f(v) = min({v} ∪ {labels of ancestors}) via
      iterated edge-join + min-aggregate;
    * backward fixpoint b(v) = the same on reversed edges;
    * every node with f(v) == b(v) == m is mutually reachable with m
      (m →* v from the forward pass, v →* m from the backward pass),
      so (v, m) is final: peel those nodes, semi-filter the edges, and
      repeat on the remainder.

    Each peel round removes at least the smallest remaining node's SCC
    (nothing can pollute the global minimum), so rounds ≤ #SCC layers;
    hub-heavy KG graphs peel in a handful.  A member v of SCC(m) whose
    f or b is "polluted" by a smaller node OUTSIDE the SCC simply waits
    until that node's own SCC is peeled — every SCC is then assigned in
    one round, all members together, id = its minimum member
    (deterministic lexicographic min on string ids).

    Scale design mirrors :func:`connected_components`: every fixpoint
    iteration is one join + one min-aggregate on the node key, lineage
    is truncated by parquet round-trips of the (node-sized) label
    table, convergence is a changed-label count, and the active-edge
    table shrinks monotonically (two semi-joins per peel).  Production
    systems add the FW-BW trim-and-recurse refinement for giant-SCC
    graphs; the label loop here is the deterministic, oracle-replayable
    core.  Raises after ``max_peel_rounds`` (an SCC "chain" deeper than
    that means the graph wants the recursive refinement).
    """
    spark = edges.sparkSession
    if stats is None:
        stats = {}
    stats["peels"] = []
    own_dir = stage_dir is None
    if own_dir:
        stage_dir = tempfile.mkdtemp(prefix="ddaugner_scc_")
        import atexit

        atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)

    def _rt(df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(f"{stage_dir}/{name}")
        return spark.read.parquet(f"{stage_dir}/{name}")

    e = _rt(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct(),
        "edges",
    )
    active = _rt(
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct(),
        "active",
    )

    def _min_fixpoint(edges_df: DataFrame, out_col: str, tag: str) -> DataFrame:
        """Propagate min labels along edges (s -> d for 'f', reversed
        for 'b') within the active subgraph until fixpoint."""
        s_col, d_col = ("s", "d") if out_col == "f" else ("d", "s")
        lab = _rt(
            active.select("node", F.col("node").alias("lbl")), f"{tag}_it0"
        )
        for it in range(max_fix_rounds):
            t0 = time.time()
            cand = (
                edges_df.join(lab, edges_df[s_col] == lab["node"])
                .groupBy(F.col(d_col).alias("cnode"))
                .agg(F.min("lbl").alias("nlbl"))
            )
            merged = lab.join(cand, lab["node"] == cand["cnode"], "left").select(
                lab["node"].alias("node"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce(F.col("nlbl"), F.col("lbl")) < F.col("lbl")).alias(
                    "chg"
                ),
            )
            merged = _rt(merged, f"{tag}_it{it + 1}")
            n_chg = merged.filter("chg").count()
            lab = merged.select("node", "lbl")
            stats["peels"].append(
                {"fix": tag, "it": it + 1, "changed": n_chg,
                 "sec": round(time.time() - t0, 3)}
            )
            if n_chg == 0:
                break
        else:
            raise RuntimeError(
                f"SCC label fixpoint did not converge in {max_fix_rounds} "
                f"iterations (component diameter exceeds the budget)"
            )
        return lab.select("node", F.col("lbl").alias(out_col))

    parts = []
    for rnd in range(max_peel_rounds):
        f = _min_fixpoint(e, "f", f"r{rnd}_f")
        b = _min_fixpoint(e, "b", f"r{rnd}_b")
        fb = f.join(b, "node")
        done = _rt(
            fb.filter(F.col("f") == F.col("b")).select(
                "node", F.col("f").alias("scc_id")
            ),
            f"done_r{rnd}",
        )
        parts.append(done)
        remaining = _rt(active.join(done, "node", "left_anti"), f"active_r{rnd}")
        n_remaining = remaining.count()
        stats["peels"].append({"round": rnd, "remaining": n_remaining})
        if n_remaining == 0:
            active = remaining
            break
        active = remaining
        e = _rt(
            e.join(
                active.select(F.col("node").alias("s")), "s", "left_semi"
            ).join(active.select(F.col("node").alias("d")), "d", "left_semi"),
            f"edges_r{rnd}",
        )
    else:
        raise RuntimeError(
            f"SCC did not converge in {max_peel_rounds} peel rounds"
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return _rt(out, "scc_final")


def connected_components_star(
    edges: DataFrame,
    max_iter: int = 50,
    stage_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(entity, component) by alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the O(log² n)-round alternative to
    :func:`connected_components`' hash-min label propagation, kept as
    a contract-identical A/B: same string node ids, same
    lexicographic-min component labels, same edge-list input.

    Per round over the current edge set E:

    * large-star: for every node u, m = min(Γ(u) ∪ {u}); re-hang every
      STRICTLY LARGER neighbor v > u onto m — long chains collapse
      toward minima without ever moving a smaller node;
    * small-star: orient every edge to its larger endpoint, m = min of
      u's smaller neighbors ∪ {u}; re-hang those neighbors and u onto
      m — local stars flatten.

    The fixpoint is a forest of depth-1 stars rooted at each
    component's minimum; the star edges ARE the label table.  Rounds
    are O(log² n) independent of diameter — the classic MapReduce
    argument against plain label propagation.  MEASURED VERDICT
    (local[32], the 6M-node/5.9M-edge chain-64 graph from the
    SPARK_GRAFT_CC_SCALE leg, interleaved quiet-box run, stats in
    docs/PLANS.md): star 111.7 s / 7 rounds vs
    :func:`connected_components` 53.6 s / 6 iterations — OUR hash-min
    is not plain label-prop: it pointer-jumps (log rounds, not
    diameter) and broadcasts the label table, while star contraction's
    edge set stays ≈|V| on chain graphs (every non-root keeps exactly
    one star edge), so its per-round cost never shrinks.  Kept as the
    contract-identical correctness A/B and for the regime the
    measurement doesn't cover (label tables too big to broadcast with
    skewed hub degrees, where rewriting edges toward minima relieves
    the join skew hash-min re-pays every round).
    Convergence is detected by (count, sum-of-hashes) of the edge set
    — exact for set equality up to hash collision on the 64-bit
    xxhash, and one cheap aggregate per round instead of a subtract.

    Same determinism/checkpoint contract as hash-min: parquet
    round-trip per round under ``stage_dir``, results invariant under
    repartition.
    """
    import atexit
    import shutil

    spark = edges.sparkSession
    if stats is None:
        stats = {}
    stats["rounds"] = []
    if stage_dir is None:
        stage_dir = tempfile.mkdtemp(prefix="ddaugner_ccstar_")
        atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)

    def _rt(df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(f"{stage_dir}/{name}")
        return spark.read.parquet(f"{stage_dir}/{name}")

    def _sig(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select("a", "b").unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("mn", F.col("a")).alias("m"))
        return (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        mins = o.groupBy("a").agg(F.min("b").alias("m"))
        hang_nbrs = o.join(mins, "a").select(F.col("b").alias("a"), "m")
        hang_self = mins.select("a", "m")
        return (
            hang_nbrs.unionByName(hang_self.select(F.col("a"), F.col("m")))
            .where(F.col("a") != F.col("m"))
            .select("a", F.col("m").alias("b"))
            .distinct()
        )

    nodes = _rt(
        edges.select(F.col("a").alias("entity"))
        .unionByName(edges.select(F.col("b").alias("entity")))
        .distinct(),
        "nodes",
    )
    e = _rt(
        edges.select("a", "b").where(F.col("a") != F.col("b")).distinct(), "e_0"
    )
    sig = _sig(e)
    for it in range(1, max_iter + 1):
        t0 = time.time()
        e = _rt(small_star(large_star(e)), f"e_{it % 2 + 1}")
        new_sig = _sig(e)
        stats["rounds"].append(
            {"round": it, "sec": round(time.time() - t0, 3), "n_edges": new_sig[0]}
        )
        if new_sig == sig:
            break
        sig = new_sig
    # fixpoint: e is (child, root) star edges; roots label themselves
    labels = e.select(F.col("a").alias("entity"), F.col("b").alias("component"))
    return _rt(
        nodes.join(labels, "entity", "left").select(
            "entity", F.coalesce("component", F.col("entity")).alias("component")
        ),
        "labels_final",
    )
