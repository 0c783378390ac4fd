"""Auxiliary benchmarks OUTSIDE the frozen bench.py (round 6).

bench.py is the driver's frozen measurement contract; everything
exploratory lives here instead (per the optimization-round rules):

* ``noop``  — noop-sink isolation of the flagship computations (guide
  §1.4: ``df.write.format("noop")`` computes every column of every row
  and discards it, so the number is the computation, not the sink);
* ``ccnb``  — connected components with ``broadcast_labels=False`` on
  an amplified co-mention graph: the 10^12-doc fallback path (VERDICT
  r5 #4) gets a measured number and a plan assertion (labels exchanged,
  edges scanned — SortMergeJoin/ShuffledHashJoin, no BroadcastHashJoin
  in the iteration);
* ``scale64`` — one flagship leg at ×(AMPLIFY·64) amplification
  (VERDICT r5 #6 scale rehearsal) watching wall and plan-construction
  cost.

Usage: python bench_extra.py [noop|ccnb|scale64 ...]   (default: noop ccnb)
Prints one JSON line per section.
"""

from __future__ import annotations

import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ddaugner_spark.session import get_spark
from ddaugner_spark.sources import gazetteer_df, synthesize_pages, extract_text
from ddaugner_spark.operators import canonical, linking, mentions, triples

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _leg(spark, name, fn, out, reps=2):
    best = None
    for _ in range(max(1, reps)):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    spark.sparkContext.setJobDescription(None)
    out[name] = round(best, 3)


def _amplified(spark, factor):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.amplified_docs(spark, SF_DIR, factor)


def noop_section(spark) -> dict:
    """Flagship computations, noop-isolated (no sink in the timing)."""
    import shutil

    corpus_dir = "/tmp/ddaugner_extra_corpus"
    shutil.rmtree(corpus_dir, ignore_errors=True)
    _amplified(spark, AMPLIFY).write.parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    pages = synthesize_pages(docs)
    extracted = pages.select("doc_id", extract_text(F.col("html")).alias("text"))
    out: dict = {}
    m = mentions.mentions_df(extracted)
    _noop(m)  # warm codegen
    _leg(spark, "mentions_noop", lambda: _noop(mentions.mentions_df(extracted)), out)
    _leg(
        spark,
        "link_scores_noop",
        lambda: _noop(linking.link_scores(mentions.mentions_df(docs), gazetteer_df(spark))),
        out,
    )
    _leg(spark, "triples_noop", lambda: _noop(triples.triples_df(extracted)), out)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    return out


def ccnb_section(spark, n_nodes: int = 1_000_000, chain: int = 64) -> dict:
    """Non-broadcast CC (broadcast_labels=False) on a synthetic chain
    graph whose label table (1M string nodes) is past the 8 MB
    auto-broadcast threshold, so the per-iteration hash-min join
    genuinely EXCHANGES the label table — the 10^12-doc fallback path
    (VERDICT r5 #4).  The iteration-join plan is asserted, not
    eyeballed: it must be a SortMergeJoin or ShuffledHashJoin, not a
    BroadcastHashJoin (the co-mention bench graph is 13 nodes — any
    leg built on it auto-broadcasts no matter what the flag says)."""
    ids = spark.range(n_nodes).select(
        F.lpad(F.col("id").cast("string"), 9, "0").alias("a"),
        F.when(
            (F.col("id") + 1) % chain != 0,
            F.lpad((F.col("id") + 1).cast("string"), 9, "0"),
        ).alias("b"),
    )
    edges = ids.filter(F.col("b").isNotNull())
    edges.write.mode("overwrite").parquet("/tmp/ddaugner_extra_ccnb_e")
    edges = spark.read.parquet("/tmp/ddaugner_extra_ccnb_e")

    # plan pin: one hash-min iteration exactly as the operator builds it
    # with broadcast_labels=False (parquet-backed label table, as in the
    # loop) — the join over the 1M-row label side must not broadcast
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = sym.groupBy(F.col("a").alias("node")).agg(
        F.least(F.min("a"), F.min("b")).alias("label")
    )
    labels.write.mode("overwrite").parquet("/tmp/ddaugner_extra_ccnb_l")
    labels = spark.read.parquet("/tmp/ddaugner_extra_ccnb_l")
    it_join = sym.join(labels, sym.b == labels.node).groupBy(
        F.col("a").alias("node2")
    ).agg(F.min("label").alias("nbr_label"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        it_join.explain("formatted")
    plan = buf.getvalue()
    join_exchanges = ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert join_exchanges, "iteration join unexpectedly broadcast"

    st: dict = {}
    t0 = time.time()
    n_comp = (
        canonical.connected_components(
            edges,
            stage_dir="/tmp/ddaugner_extra_ccnb",
            broadcast_labels=False,
            stats=st,
        )
        .select("component")
        .distinct()
        .count()
    )
    wall = round(time.time() - t0, 3)
    import shutil

    shutil.rmtree("/tmp/ddaugner_extra_ccnb_e", ignore_errors=True)
    shutil.rmtree("/tmp/ddaugner_extra_ccnb_l", ignore_errors=True)
    shutil.rmtree("/tmp/ddaugner_extra_ccnb", ignore_errors=True)
    return {
        "cc_nonbroadcast_sec": wall,
        "n_nodes": st.get("n_nodes"),
        "n_components": n_comp,
        "components_expected": n_nodes // chain,
        "iters": st.get("iters"),
        "iteration_join_exchanges": join_exchanges,
    }


def scale64_section(spark) -> dict:
    """One flagship mention+triple pass at ×(AMPLIFY·64) — watches wall
    and driver-side plan-construction cost at rehearsal scale."""
    import shutil

    corpus_dir = "/tmp/ddaugner_extra_scale64"
    shutil.rmtree(corpus_dir, ignore_errors=True)
    _amplified(spark, AMPLIFY * 64).write.parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    t_plan0 = time.time()
    m = mentions.mentions_df(docs)
    plan_sec = round(time.time() - t_plan0, 3)
    t0 = time.time()
    _noop(m)
    m_sec = round(time.time() - t0, 3)
    t0 = time.time()
    _noop(triples.triples_df(docs))
    t_sec = round(time.time() - t0, 3)
    n = docs.count()
    shutil.rmtree(corpus_dir, ignore_errors=True)
    return {
        "amplify": AMPLIFY * 64,
        "docs": n,
        "plan_construct_sec": plan_sec,
        "mentions_noop_sec": m_sec,
        "triples_noop_sec": t_sec,
    }


def main():
    sections = sys.argv[1:] or ["noop", "ccnb"]
    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for s in sections:
            if s == "noop":
                print(json.dumps({"section": "noop", **noop_section(spark)}))
            elif s == "ccnb":
                print(json.dumps({"section": "ccnb", **ccnb_section(spark)}))
            elif s == "scale64":
                print(json.dumps({"section": "scale64", **scale64_section(spark)}))
            else:
                print(json.dumps({"error": f"unknown section {s}"}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
