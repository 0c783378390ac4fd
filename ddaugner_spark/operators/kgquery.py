"""SPARQL-style pattern queries, schema-integrity screening, and
AMIE-lite Horn-rule mining over the constructed triple store.

The reference stops at NER mentions (/root/reference/ddaugner/
utils.py:111-166 spans); the engine constructs (subj, pred, obj)
triples on top (operators/triples.py).  This module adds the three
consumers every production KG store runs against that table:

* ``star_pattern`` — the conjunctive basic-graph-pattern core of
  SPARQL (``?x p1 ?y . ?x p2 ?z``), the sibling of the chain shape in
  graph.two_hop_paths;
* ``domain_range_violations`` — integrity screening of every typed
  signature against the predicate's induced majority signature (the
  consumer of triples.relation_signatures' schema induction);
* ``mine_chain_rules`` — AMIE-style mining of
  ``p(x,y) AND q(y,z) => r(x,z)`` rules with standard and PCA
  confidence (Galárraga et al., WWW 2013).

Scale notes are per-function; everything is join/aggregate-only, no
Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def edge_support(tri: DataFrame) -> DataFrame:
    """(subj, pred, obj, support): attestation counts per distinct
    triple — one hash aggregate with map-side combine."""
    return tri.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def star_pattern(
    tri: DataFrame, p1: str, p2: str, fanout_cap: int = 8
) -> DataFrame:
    """Star basic graph pattern ``?x p1 ?y . ?x p2 ?z`` with ``y != z``:
    all (x, y, z) bindings, each leg carrying its attestation support.

    Plan: ONE support aggregation feeds both legs (the pred filter and
    the per-(subj, pred) cap run on the aggregated table, which is
    orders of magnitude smaller than the raw triple stream), then an
    equi-join on ``x``.  The cap keeps a hub subject with 10^5
    p1-objects from squaring inside the star — the same Wikipedia-skew
    guard as graph.two_hop_paths' fanout_cap, deterministic via
    (support DESC, obj) ordering.  Both join inputs hash-partition on
    the same key, so Catalyst plans one exchange per side and AQE can
    broadcast the smaller leg when a selective predicate shrinks it.
    """
    e = edge_support(tri).filter(F.col("pred").isin([p1, p2]))
    w = Window.partitionBy("subj", "pred").orderBy(F.desc("support"), "obj")
    capped = (
        e.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= fanout_cap)
        .drop("r")
    )
    a = capped.filter(F.col("pred") == p1).select(
        F.col("subj").alias("x"),
        F.col("obj").alias("y"),
        F.col("support").alias("support_y"),
    )
    b = capped.filter(F.col("pred") == p2).select(
        F.col("subj").alias("x"),
        F.col("obj").alias("z"),
        F.col("support").alias("support_z"),
    )
    return a.join(b, "x").filter(F.col("y") != F.col("z"))


def domain_range_violations(tri: DataFrame) -> DataFrame:
    """Schema-integrity screen: every (pred, subj_tag, obj_tag)
    signature with its mass, the predicate's MAJORITY signature, and
    per-side ``subj_ok`` / ``obj_ok`` flags plus the combined
    ``is_violation``.

    The majority pick uses the packed fixed-width key device
    (lpad(1e18 - n) || '#' || tags — 19 digits, safe for any int64-countable signature mass): a plain ``min`` both engines agree
    on bit-for-bit, ties broken lexically by (subj_tag, obj_tag) — a
    struct/argmax would not be cross-engine deterministic.  The
    majority table is predicate-sized and broadcast; the only shuffle
    is the signature aggregation itself.
    """
    sigs = tri.groupBy("pred", "subj_tag", "obj_tag").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    key = F.concat_ws(
        "#",
        F.lpad(
            (F.lit(1000000000000000000) - F.col("n")).cast("string"), 19, "0"
        ),
        F.col("subj_tag"),
        F.col("obj_tag"),
    )
    maj = (
        sigs.select("pred", key.alias("k"))
        .groupBy("pred")
        .agg(F.min("k").alias("k"))
        .select(
            "pred",
            F.split("k", "#").getItem(1).alias("maj_subj_tag"),
            F.split("k", "#").getItem(2).alias("maj_obj_tag"),
        )
    )
    out = sigs.join(F.broadcast(maj), "pred")
    subj_ok = F.col("subj_tag") == F.col("maj_subj_tag")
    obj_ok = F.col("obj_tag") == F.col("maj_obj_tag")
    return out.select(
        "pred",
        "subj_tag",
        "obj_tag",
        "n",
        "maj_subj_tag",
        "maj_obj_tag",
        subj_ok.alias("subj_ok"),
        obj_ok.alias("obj_ok"),
        (~(subj_ok & obj_ok)).alias("is_violation"),
    )


def mine_chain_rules(tri: DataFrame, min_support: int = 2) -> DataFrame:
    """AMIE-lite chain-rule mining: for every rule
    ``p(x,y) AND q(y,z) => r(x,z)`` report

    * ``support``  — #distinct (x, z) satisfying body AND head;
    * ``n_body``   — #distinct (x, z) satisfying the body;
    * ``conf``     — support / n_body (standard confidence);
    * ``n_pca``    — #distinct body (x, z) where x has ANY r-edge;
    * ``pca_conf`` — support / n_pca (PCA confidence: under the
      partial-completeness assumption, a body pair whose x has no
      r-edge at all is unknown, not false — AMIE's key idea).

    Plan: the body chain join shuffles the deduplicated edge table on
    the shared entity ``y`` (both sides co-partitioned, one exchange
    each); support/PCA joins run on (x, z) / (x).  The per-rule
    aggregates are predicate³-sized, so the nbody/pca join-backs are
    broadcasts.  At web scale the body enumeration is the quadratic
    risk — production caps per-y fanout exactly like
    graph.two_hop_paths (or samples bodies, as AMIE+ does); exact here
    so the SQL oracle can replay it.
    """
    e = tri.select("subj", "pred", "obj").distinct()
    a = e.select(
        F.col("pred").alias("p"), F.col("subj").alias("x"), F.col("obj").alias("y")
    )
    b = e.select(
        F.col("pred").alias("q"), F.col("subj").alias("y"), F.col("obj").alias("z")
    )
    body = (
        a.join(b, "y")
        .filter(F.col("x") != F.col("z"))
        .select("p", "q", "x", "z")
        .distinct()
    )
    n_body = body.groupBy("p", "q").agg(
        F.count(F.lit(1)).cast("long").alias("n_body")
    )
    head = e.select(
        F.col("pred").alias("r"), F.col("subj").alias("x"), F.col("obj").alias("z")
    )
    supp = (
        body.join(head, ["x", "z"])
        .groupBy("p", "q", "r")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    h_subj = e.select(
        F.col("pred").alias("r"), F.col("subj").alias("x")
    ).distinct()
    pca = (
        body.join(h_subj, "x")
        .groupBy("p", "q", "r")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pca"))
    )
    return (
        supp.filter(F.col("support") >= min_support)
        .join(F.broadcast(n_body), ["p", "q"])
        .join(F.broadcast(pca), ["p", "q", "r"])
        .select(
            F.col("p").alias("body_pred1"),
            F.col("q").alias("body_pred2"),
            F.col("r").alias("head_pred"),
            "support",
            "n_body",
            F.round(F.col("support") / F.col("n_body"), 6).alias("conf"),
            "n_pca",
            F.round(F.col("support") / F.col("n_pca"), 6).alias("pca_conf"),
        )
    )


def functional_conflicts(
    tri: DataFrame, min_functionality: float = 0.5, sample_k: int = 3
) -> DataFrame:
    """Functional-predicate conflict screen: induce each predicate's
    FUNCTIONALITY fun(p) = |distinct subj| / |distinct (subj, obj)|
    (Galárraga et al., WWW 2013 §4 — 1.0 means every subject has one
    object), then report, for predicates at or above
    ``min_functionality``, every subject that still carries multiple
    objects — the contradiction candidates a KG-repair pass reviews
    first (born_in(x, 2 cities) is an error; member_of(x, 2 orgs) is
    not, and its low functionality keeps it out of the report).

    Returns (pred, functionality, subj, n_objs, objs) with ``objs`` a
    deterministic bounded sample: the ``sample_k`` lexicographically
    smallest distinct objects, '|'-joined.

    Scale: one distinct + one (pred, subj) count aggregate over the
    triple store (the same shuffle key family as edge_support); the
    per-pred functionality table is tiny and broadcast back.  The
    ``objs`` sample is computed ONLY for the surviving conflict groups
    (a semi-join back against the distinct triples, then a rank-≤ k
    window on that small subset) — no unbounded collect_set ever runs
    over the full store, so a hub subject cannot blow an agg buffer."""
    t = tri.select("subj", "pred", "obj").distinct()
    counts = t.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_objs")
    )
    fun = counts.groupBy("pred").agg(
        (F.count(F.lit(1)) / F.sum("n_objs")).alias("functionality")
    )
    conflicts = (
        counts.join(F.broadcast(fun), "pred")
        .filter(
            (F.col("functionality") >= min_functionality) & (F.col("n_objs") > 1)
        )
    )
    src = t.join(
        conflicts.select("pred", "subj"), ["pred", "subj"], "left_semi"
    )
    w = Window.partitionBy("pred", "subj").orderBy("obj")
    samp = (
        src.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= sample_k)
        .groupBy("pred", "subj")
        .agg(F.array_join(F.sort_array(F.collect_list("obj")), "|").alias("objs"))
    )
    return conflicts.join(samp, ["pred", "subj"]).select(
        "pred",
        F.round("functionality", 6).alias("functionality"),
        "subj",
        "n_objs",
        "objs",
    )


def optional_pattern(
    tri: DataFrame, p_req: str, p_opt: str, p_not: str
) -> DataFrame:
    """(x, y, z_min, n_z) — the SPARQL OPTIONAL / FILTER-NOT-EXISTS
    basic graph pattern over the constructed KG::

        SELECT ?x ?y WHERE { ?x p_req ?y .
                             OPTIONAL { ?x p_opt ?z }
                             FILTER NOT EXISTS { ?x p_not ?w } }

    OPTIONAL binds as a LEFT join (subjects keep their row with NULL z
    when no p_opt fact exists); the optional leg is pre-aggregated per
    subject (min obj + count) so a hub subject cannot multiply the
    required bindings — the star_pattern fanout discipline; NOT EXISTS
    is a left-anti join on the subject key.  All three legs filter the
    DISTINCT triple table by predicate first, so each join operand is
    predicate-selective, and they share the subject shuffle key.
    """
    t = tri.select("subj", "pred", "obj").distinct()
    req = t.filter(F.col("pred") == p_req).select(
        F.col("subj").alias("x"), F.col("obj").alias("y")
    )
    opt = (
        t.filter(F.col("pred") == p_opt)
        .groupBy(F.col("subj").alias("x"))
        .agg(
            F.min("obj").alias("z_min"),
            F.count(F.lit(1)).cast("long").alias("n_z"),
        )
    )
    neg = t.filter(F.col("pred") == p_not).select(F.col("subj").alias("x"))
    return (
        req.join(neg, "x", "left_anti")
        .join(opt, "x", "left")
        .select("x", "y", "z_min", F.coalesce("n_z", F.lit(0)).alias("n_z"))
    )


def kleene_path(
    tri: DataFrame,
    p1: str,
    p_star: str,
    p3: str,
    max_star: int = 3,
) -> DataFrame:
    """Bounded SPARQL property-path query ``?a p1/p_star*/p3 ?b`` over
    the constructed KG: ``(subj, obj, star_depth)`` — every (a, b) pair
    connected by one p1 edge, 0..max_star p_star edges, and one p3
    edge, with the MINIMAL star depth used.  The Kleene-star member of
    the path-query family (two_hop_paths = fixed length 2,
    bfs_distances = predicate-blind reachability); the bound makes the
    plan finite and is what a production path engine enforces anyway.

    Spark-first: the star is unrolled into ``max_star`` frontier
    extensions with a DISTINCT after each hop (the BFS device — the
    frontier is a set, so a diamond in the graph cannot double rows),
    and the per-level frontiers union into one min-depth aggregate.
    Each leg filters the DISTINCT predicate-selective edge table first,
    so every join operand is small; all joins share entity keys.  The
    plan is constant-size in the corpus (max_star joins), no iteration
    checkpointing needed at this depth.
    """
    t = tri.select("subj", "pred", "obj").distinct()
    e1 = t.filter(F.col("pred") == p1).select(
        F.col("subj").alias("a"), F.col("obj").alias("x")
    )
    es = t.filter(F.col("pred") == p_star).select(
        F.col("subj").alias("sx"), F.col("obj").alias("sy")
    )
    e3 = t.filter(F.col("pred") == p3).select(
        F.col("subj").alias("y"), F.col("obj").alias("b")
    )
    levels = []
    cur = e1.distinct()
    for k in range(max_star + 1):
        levels.append(cur.withColumn("star_depth", F.lit(k).cast("long")))
        if k < max_star:
            cur = (
                cur.join(es, cur["x"] == es["sx"])
                .select("a", F.col("sy").alias("x"))
                .distinct()
            )
    from functools import reduce

    reach = reduce(DataFrame.unionByName, levels)
    return (
        reach.join(e3, reach["x"] == e3["y"])
        .groupBy(F.col("a").alias("subj"), F.col("b").alias("obj"))
        .agg(F.min("star_depth").alias("star_depth"))
    )


def kg_completion_eval(
    tri: DataFrame,
    dim: int = 16,
    mod: int = 17,
    sample_mod: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """KG link-prediction evaluation harness (the TransE eval protocol,
    Bordes et al. NIPS'13): for a deterministic sample of facts
    (h, r, t), rank EVERY entity t′ as a candidate tail by the L1
    translation score  Σ_i |v(h)_i + v(r)_i − v(t′)_i|  and report the
    gold tail's rank — one row: ``(n_facts, n_entities, mrr, hits1,
    hits3, hits10)``.

    Embeddings are HASH-DERIVED integer vectors (v(x)_i = md5 of
    ``x#i`` mod ``mod``, centered) — the same container-gated-model
    stance as the BERT stub: the EVAL HARNESS (candidate fan-out,
    ranking, filtered-metric aggregation) is the real distributed
    artifact a trained-embedding table drops into; scores are exact
    integers so ranks are engine-reproducible (ties broken by
    candidate string).

    Raw (unfiltered) protocol; gold rank by (score, candidate) total
    order.  MRR avoids cross-fact float accumulation by integer
    micro-quantized reciprocal ranks (round once per fact, exact
    integer sum, ONE final division).

    Scale shape: the facts sample (1/``sample_mod`` by md5) crossJoins
    the BROADCAST entity vocabulary and a BROADCAST dim spine, then
    everything is map-only md5 arithmetic + one (fact, candidate)
    hash aggregate + a fact-keyed rank window.  Production swaps the
    all-entities candidate set for an ANN-bucketed one exactly like
    the declared brute-force ANN baseline.
    """
    facts = (
        tri.select(F.col("subj").alias("h"), F.col("pred").alias("r"),
                   F.col("obj").alias("t"))
        .distinct()
        .filter(
            F.conv(
                F.substring(F.md5(F.concat_ws("#", "h", "r", "t")), 1, 4), 16, 10
            ).cast("long")
            % sample_mod
            == 0
        )
    )
    ents = (
        tri.select(F.col("subj").alias("e"))
        .unionByName(tri.select(F.col("obj").alias("e")))
        .distinct()
    )

    def vec(col, i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", col, i.cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % mod
            - mod // 2
        )

    dims = facts.sparkSession.range(dim).select(F.col("id").alias("i"))
    fan = facts.crossJoin(F.broadcast(ents)).crossJoin(F.broadcast(dims))
    term = F.abs(
        vec(F.col("h"), F.col("i"))
        + vec(F.col("r"), F.col("i"))
        - vec(F.col("e"), F.col("i"))
    )
    scores = fan.groupBy("h", "r", "t", "e").agg(
        F.sum(term).cast("long").alias("score")
    )
    w = Window.partitionBy("h", "r", "t").orderBy("score", "e")
    ranked = scores.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("e") == F.col("t")
    )
    n_ents = ents.agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.sum(F.round(F.lit(1000000.0) / F.col("rnk"), 0).cast("long"))
        .cast("long")
        .alias("rr_sum"),
        F.sum((F.col("rnk") <= 1).cast("long")).cast("long").alias("h1"),
        F.sum((F.col("rnk") <= 3).cast("long")).cast("long").alias("h3"),
        F.sum((F.col("rnk") <= 10).cast("long")).cast("long").alias("h10"),
    )
    return agg.crossJoin(F.broadcast(n_ents)).select(
        "n_facts",
        "n_entities",
        F.round(
            F.col("rr_sum").cast("double") / F.col("n_facts") / F.lit(1000000.0),
            ndigits,
        ).alias("mrr"),
        F.round(F.col("h1").cast("double") / F.col("n_facts"), ndigits).alias(
            "hits1"
        ),
        F.round(F.col("h3").cast("double") / F.col("n_facts"), ndigits).alias(
            "hits3"
        ),
        F.round(F.col("h10").cast("double") / F.col("n_facts"), ndigits).alias(
            "hits10"
        ),
    )


def entity_fact_summary(triples: DataFrame, k: int = 3) -> DataFrame:
    """(subj, rank, pred, obj, pred_freq) — the top-``k`` most
    INFORMATIVE facts per subject entity: distinct facts ranked
    rarest-predicate-first (global predicate frequency ascending, ties
    by (pred, obj) text), the degenerate-but-exact core of RELIN/
    FACES-style entity summarization — a hub entity's card shows its
    distinguishing facts, not its thousand generic ones.

    Determinism: predicate frequency is an exact long; the per-entity
    rank is a row_number over the TOTAL order (pred_freq, pred, obj).

    Shape at scale: one distinct-fact dedup (slim keys), a
    predicate-count-sized broadcast back onto the facts, one
    per-subject window — partitioned by subj, so no global sort; the
    fan cap k bounds every entity's output including hubs.
    """
    facts = triples.select("subj", "pred", "obj").distinct()
    pf = facts.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("pred_freq")
    )
    w = Window.partitionBy("subj").orderBy("pred_freq", "pred", "obj")
    return (
        facts.join(F.broadcast(pf), "pred")
        .select(
            "subj",
            F.row_number().over(w).cast("long").alias("rank"),
            "pred",
            "obj",
            "pred_freq",
        )
        .where(F.col("rank") <= k)
    )



def pra_path_features(
    triples: DataFrame,
    min_support: int = 2,
    fanout_cap: int = 5,
    qscale: int = 10**12,
    ndigits: int = 9,
) -> DataFrame:
    """(subj, path, obj, prob_q, prob) — Path-Ranking-Algorithm random-
    walk features (Lao & Cohen, ECML 2010; the relation-path feature
    extractor under Knowledge Vault's fusion layer): for every typed
    path of length 1 (``p``) or 2 (``p1/p2``) between two entities,
    the probability that a walker leaving ``subj`` and following the
    path's relation types uniformly lands on ``obj``.  These rows ARE
    the feature matrix a downstream per-relation classifier trains on
    — the engine ships the corpus-scale feature extraction, the model
    is a client concern (the q_kg_completion division of labor).

    Graph contract: support-weighted edges with ``support ≥
    min_support``, each mid capped to its ``fanout_cap`` best-attested
    in/out edges (the :func:`~ddaugner_spark.operators.graph.
    two_hop_paths` hub guard, same deterministic tie-break) — walk
    degrees are RECOMPUTED on the capped set so every per-(node, pred)
    step stays a proper distribution over retained edges.

    Exactness: step probabilities are 1/d rationals; each length-2
    mid term is quantized ONCE as the exact integral
    ``qscale DIV (d1·d2)`` and the per-(subj, path, obj) Σ over mids
    is an INTEGER sum (the B³ device — no float walk math anywhere);
    ``prob`` is one final division.  Scale: everything after the edge
    aggregation is edge-table-sized; the mid join emits ≤ cap² rows
    per mid by construction.
    """
    edges = (
        triples.groupBy("subj", "pred", "obj")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    w_in = Window.partitionBy("obj").orderBy(F.desc("support"), "pred", "subj")
    w_out = Window.partitionBy("subj").orderBy(F.desc("support"), "pred", "obj")
    h1 = (
        edges.withColumn("r", F.row_number().over(w_in))
        .filter(F.col("r") <= fanout_cap)
        .select("subj", "pred", "obj")
    )
    h2 = (
        edges.withColumn("r", F.row_number().over(w_out))
        .filter(F.col("r") <= fanout_cap)
        .select("subj", "pred", "obj")
    )
    d1 = h1.groupBy("subj", "pred").agg(F.count("*").cast("long").alias("d1"))
    d2 = h2.groupBy("subj", "pred").agg(F.count("*").cast("long").alias("d2"))
    # length-1 features off the support-pruned edge set (uncapped —
    # the direct edge IS the candidate fact, never hub-fanned)
    dd = edges.groupBy("subj", "pred").agg(
        F.count("*").cast("long").alias("d")
    )
    f1 = edges.join(dd, ["subj", "pred"]).select(
        "subj",
        F.col("pred").alias("path"),
        "obj",
        F.expr(f"CAST({qscale} DIV d AS LONG)").alias("prob_q"),
    )
    left = h1.join(d1, ["subj", "pred"]).select(
        "subj",
        F.col("pred").alias("p1"),
        F.col("obj").alias("mid"),
        "d1",
    )
    right = h2.join(d2, ["subj", "pred"]).select(
        F.col("subj").alias("mid"),
        F.col("pred").alias("p2"),
        F.col("obj").alias("obj2"),
        "d2",
    )
    f2 = (
        left.join(right, "mid")
        .select(
            "subj",
            F.concat_ws("/", "p1", "p2").alias("path"),
            F.col("obj2").alias("obj"),
            F.expr(f"CAST({qscale} DIV (d1 * d2) AS LONG)").alias("t"),
        )
        .groupBy("subj", "path", "obj")
        .agg(F.sum("t").cast("long").alias("prob_q"))
    )
    out = f1.unionByName(f2)
    return out.select(
        "subj",
        "path",
        "obj",
        "prob_q",
        F.round(
            F.col("prob_q").cast("double") / F.lit(float(qscale)), ndigits
        ).alias("prob"),
    )
