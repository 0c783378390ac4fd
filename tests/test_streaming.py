"""Structured-Streaming front-end: AvailableNow incremental runs."""

import pyspark.sql.functions as F

from ddaugner_spark.streaming import incremental_event_counts, incremental_mentions
from ddaugner_spark.operators import mentions


def test_incremental_event_counts_matches_batch(spark, sf_dir, tmp_path):
    """Append-mode semantics: a window emits only once the watermark has
    passed its end, so the streaming result must equal the batch result
    restricted to windows closed at (max_ts - watermark); the last open
    windows stay in state — exactly the late-data contract."""
    out = incremental_event_counts(
        spark, f"{sf_dir}/events.parquet", str(tmp_path / "ckpt"),
        window="10 minutes", watermark="30 minutes",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .filter(
            F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert want and got == want


def test_incremental_mentions_idempotent(spark, sf_dir, tmp_path):
    ckpt, out = str(tmp_path / "ck2"), str(tmp_path / "m_out")
    n1 = incremental_mentions(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    batch = mentions.mentions_df(spark.read.parquet(f"{sf_dir}/documents.parquet")).count()
    assert n1 == batch
    # second run with same checkpoint: no new input → same row count
    n2 = incremental_mentions(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    assert n2 == n1


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer == batch lag/cumsum sessionizer."""
    from pyspark.sql import Window
    from ddaugner_spark.streaming.stateful import streaming_user_sessions

    got = {
        (r["user_id"], r["n_events"], r["n_sessions"])
        for r in streaming_user_sessions(
            spark, f"{sf_dir}/events.parquet", str(tmp_path / "ck")
        ).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    batch = (
        e.withColumn("is_new", (gap > 1800 * 1_000_000).cast("long"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.lit(1) + F.coalesce(F.sum("is_new"), F.lit(0))).alias("n_sessions"),
        )
    )
    want = {(r["user_id"], r["n_events"], r["n_sessions"]) for r in batch.collect()}
    assert got == want


def test_incremental_triples_match_batch(spark, sf_dir, tmp_path):
    """foreachBatch triple sink == batch triple extraction, and re-running
    with the same checkpoint appends nothing."""
    from ddaugner_spark.streaming import incremental_triples
    from ddaugner_spark.operators import triples

    ckpt, out = str(tmp_path / "ck3"), str(tmp_path / "t_out")
    n1 = incremental_triples(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    batch = triples.triples_df(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    want = {tuple(r) for r in batch.collect()}
    # the sink is laid out as epoch_id=N partition dirs (idempotent replay)
    got = {tuple(r) for r in spark.read.parquet(out).drop("epoch_id").collect()}
    assert n1 == len(want) and got == want
    n2 = incremental_triples(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    assert n2 == n1


def test_incremental_triples_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A crash between sink write and offset commit replays the epoch;
    the per-epoch overwrite layout must produce identical bytes, not
    appended duplicates (at-least-once → exactly-once)."""
    from ddaugner_spark.operators import triples

    out = str(tmp_path / "t_out_replay")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = triples.triples_df(docs)
    # simulate foreachBatch running epoch 0, then the same epoch replayed
    t.write.mode("overwrite").parquet(f"{out}/epoch_id=0")
    t.write.mode("overwrite").parquet(f"{out}/epoch_id=0")
    got = spark.read.parquet(out).drop("epoch_id")
    assert got.count() == t.count()


def test_incremental_link_scores_match_batch(spark, sf_dir, tmp_path):
    """Streaming per-epoch link partials re-aggregate to the batch
    link_scores result (incremental-rollup contract), and a checkpointed
    re-run adds nothing."""
    from ddaugner_spark.streaming import incremental_link_scores
    from ddaugner_spark.operators import linking, mentions
    from ddaugner_spark.sources.gazetteer import gazetteer_df

    ckpt, out = str(tmp_path / "ck_ls"), str(tmp_path / "ls_out")
    got = incremental_link_scores(
        spark, f"{sf_dir}/documents.parquet", ckpt, out
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = linking.link_scores(mentions.mentions_df(docs), gazetteer_df(spark))
    g = {(r["entity"], r["class"]): (r["n_mentions"], r["total_score"]) for r in got.collect()}
    w = {(r["entity"], r["class"]): (r["n_mentions"], r["total_score"]) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0], k
        # per-epoch rounding: partial sums rounded to 4 digits before the
        # final merge — equal to the batch number within 1e-3
        assert abs(g[k][1] - w[k][1]) < 1e-3, (k, g[k], w[k])

    got2 = incremental_link_scores(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    g2 = {(r["entity"], r["class"]): (r["n_mentions"], r["total_score"]) for r in got2.collect()}
    assert g2 == g


def test_incremental_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    the emitted first-seen hash set equals the batch DISTINCT md5(text)
    over the dup-amplified corpus, and a replay with the same
    checkpoint is a no-op."""
    import pyspark.sql.functions as F

    from ddaugner_spark.operators import dedup
    from ddaugner_spark.streaming import incremental_dedup

    ckpt, out = str(tmp_path / "ckdd"), str(tmp_path / "dd_out")
    n1 = incremental_dedup(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    corpus = dedup.with_dup_corpus(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    want = {
        r["text_hash"]
        for r in corpus.select(F.md5("text").alias("text_hash")).distinct().collect()
    }
    got = {r["text_hash"] for r in spark.read.parquet(out).collect()}
    assert got == want
    assert n1 == len(want)
    n2 = incremental_dedup(spark, f"{sf_dir}/documents.parquet", ckpt, out)
    assert n2 == n1


def test_incremental_cm_sketch_folds_across_batches(spark, sf_dir, tmp_path):
    """Streaming Count-Min: state is the depth×width cell table, so
    micro-batches fold into it by addition.  Run over half the corpus,
    land the second half as new files, rerun with the SAME checkpoint:
    the final table must equal the batch sketch over the full corpus —
    the merge-by-addition property that makes CM the streaming shape."""
    from ddaugner_spark.operators import sketches
    from ddaugner_spark.streaming import incremental_cm_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src, ckpt = str(tmp_path / "cm_src"), str(tmp_path / "cm_ck")
    half1 = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 0)
    half2 = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 1)
    half1.write.parquet(src)

    t1 = incremental_cm_sketch(spark, src, ckpt, depth=3, width=16)
    toks1 = half1.select(
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("token")
    ).filter(F.col("token") != "")
    want1 = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cm_sketch(toks1, "token", depth=3, width=16).collect()
    }
    got1 = {(r["row_idx"], r["bucket"]): r["cnt"] for r in t1.collect()}
    assert got1 == want1 and got1

    half2.write.mode("append").parquet(src)
    t2 = incremental_cm_sketch(spark, src, ckpt, depth=3, width=16)
    toks = docs.select(
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("token")
    ).filter(F.col("token") != "")
    want = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cm_sketch(toks, "token", depth=3, width=16).collect()
    }
    got = {(r["row_idx"], r["bucket"]): r["cnt"] for r in t2.collect()}
    assert got == want and len(got) > len(got1) // 2


def _upsert_fixture(spark):
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("a", "p", "x", 3), ("b", "p", "y", 4), ("c", "p", "z", 5)],
        "subj string, pred string, obj string, support long",
    )
    cdc = spark.createDataFrame(
        [
            ("a", "p", "x", "u", 10, 30),
            ("b", "p", "y", "d", 11, 0),
            ("n", "p", "w", "u", 12, 1),
            ("b", "p", "y", "u", 9, 99),   # OLDER than the delete: must NOT resurrect
            ("n", "p", "w", "u", 13, 2),
        ],
        "subj string, pred string, obj string, op string, ts long, support long",
    )
    return base, cdc


def test_incremental_upsert_matches_batch_and_split_invariant(spark, tmp_path):
    """Streaming CDC fold == batch upsert_triples over the whole change
    set, for EVERY micro-batch split (associativity of
    merge_triple_state with tombstones retained)."""
    from ddaugner_spark.operators.triples import upsert_triples
    from ddaugner_spark.streaming import incremental_upsert

    base, cdc = _upsert_fixture(spark)
    want = {tuple(r) for r in upsert_triples(base, cdc).collect()}
    assert ("b", "p", "y", 99, 11) not in want  # late-older-than-delete pinned
    for i, nfiles in enumerate((1, 5)):
        cdc_dir = str(tmp_path / f"cdc{i}")
        cdc.repartition(nfiles).write.parquet(cdc_dir)
        got = incremental_upsert(
            spark,
            base,
            cdc_dir,
            str(tmp_path / f"ck{i}"),
            str(tmp_path / f"state{i}"),
        )
        assert {tuple(r) for r in got.collect()} == want


def test_incremental_upsert_epoch_replay_is_idempotent(spark, tmp_path):
    """Replaying an epoch (crash between state write and offset commit)
    re-reads the same predecessor version and rewrites identical state:
    tombstones retained means a second application of the same batch
    cannot resurrect or double-apply anything."""
    from ddaugner_spark.operators.triples import merge_triple_state
    from pyspark.sql import functions as F

    base, cdc = _upsert_fixture(spark)
    state0 = base.select(
        "subj", "pred", "obj",
        F.lit("u").alias("op"),
        F.col("support").cast("long").alias("support"),
        F.lit(0).cast("long").alias("last_ts"),
    )
    once = merge_triple_state(state0, cdc)
    twice = merge_triple_state(once, cdc)  # the replayed batch
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}
    # the tombstone is IN the state (that's what makes replay safe) ...
    assert once.filter("op = 'd'").count() == 1
    # ... and filtered from the read surface (a, c, n survive; b is the tombstone)
    assert once.filter("op = 'u'").count() == 3


def test_incremental_links_fold_across_batches(spark, sf_dir, tmp_path):
    """Incremental web graph: per-epoch host-graph partials re-aggregate
    to the batch edge table.  Run over half the corpus, land the second
    half, rerun with the SAME checkpoint — the merged graph must equal
    the single-batch host_graph over everything."""
    from ddaugner_spark.operators import crawl
    from ddaugner_spark.streaming import incremental_links

    def pages_of(docs):
        # minimal deterministic page build: one link per doc
        html = F.concat(
            F.lit('<html><body><a href="https://t'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('.example.com/x">x</a></body></html>'),
        )
        return docs.select(
            F.concat(F.lit("https://"), "source", F.lit(".example.com/p/"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src, ckpt = str(tmp_path / "lg_src"), str(tmp_path / "lg_ck")
    out = str(tmp_path / "lg_out")
    half1 = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 0)
    half2 = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 1)
    half1.write.parquet(src)

    incremental_links(spark, src, ckpt, out, pages_of)
    half2.write.mode("append").parquet(src)
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in incremental_links(spark, src, ckpt, out, pages_of).collect()
    }
    want = {
        (r.src_host, r.dst_host): r.n_links
        for r in crawl.host_graph(crawl.extract_links(pages_of(docs))).collect()
    }
    assert got == want and got


def test_stream_attribution_matches_batch_across_catchup(spark, sf_dir, tmp_path):
    """Stream-stream interval join: run over half the events, land the
    other half, rerun with the SAME checkpoint — the union of the two
    append outputs must equal the batch interval join over everything
    (cross-half matches prove the join state survives the checkpoint;
    exactly-once means no pair appears twice)."""
    from ddaugner_spark.streaming import incremental_attribution

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src, ckpt = str(tmp_path / "attr_src"), str(tmp_path / "attr_ck")
    out = str(tmp_path / "attr_out")
    # split by TIME, not by hash: a catch-up run receives NEWER data.
    # A hash split would interleave event times across phases and the
    # watermark would (correctly!) drop phase-2 rows older than
    # max(phase-1 ts) - 7h — that's the semantics, not a bug.  The
    # split point is placed INSIDE some matched (view, purchase)
    # interval so at least one match is guaranteed to cross the phases.
    v0 = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    p0 = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purch_id"),
        F.col("ts").cast("timestamp").alias("pts"),
    )
    pairs = v0.join(
        p0,
        (v0.u == p0.u) & (p0.pts > v0.vts)
        & (p0.pts <= v0.vts + F.expr("INTERVAL 6 HOURS")),
    ).select(
        "view_id", "purch_id",
        F.unix_micros("vts").alias("vus"), F.unix_micros("pts").alias("pus"),
    )
    cands = (
        pairs.filter(F.col("pus") > F.col("vus") + 1)
        .orderBy("vus", "view_id")
        .collect()
    )
    assert cands, "corpus has no attribution pair to straddle"
    # a MIDDLE pair, so phase 1 already holds complete matches of its own
    straddle = cands[len(cands) // 2]
    split_ts = (straddle.vus + straddle.pus) // 2
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    half1 = events.filter(us <= F.lit(int(split_ts)))
    half2 = events.filter(us > F.lit(int(split_ts)))
    half1.write.parquet(src)

    first = {
        (r.user_id, r.view_id, r.purch_id)
        for r in incremental_attribution(spark, src, ckpt, out).collect()
    }
    half2.write.mode("append").parquet(src)
    after = incremental_attribution(spark, src, ckpt, out)
    second = {
        (r.user_id, r.view_id, r.purch_id) for r in after.collect()
    }
    assert first and second > first  # phase 2 adds matches
    # exactly-once across the catch-up: the sink holds no duplicate rows
    assert after.count() == len(second)

    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purch_id"),
        F.col("ts").cast("timestamp").alias("pts"),
    )
    want = {
        (r.u, r.view_id, r.purch_id)
        for r in v.join(
            p,
            (v.u == p.u) & (p.pts > v.vts)
            & (p.pts <= v.vts + F.expr("INTERVAL 6 HOURS")),
        ).collect()
    }
    assert second == want
    # the state-store test: at least one emitted match must CROSS the
    # halves (its view buffered in phase 1, purchase arriving in phase 2
    # or vice versa) — proving join state survived the checkpoint
    h1 = {r.event_id for r in half1.collect()}
    crossers = {
        (u, vid, pid) for (u, vid, pid) in want if (vid in h1) != (pid in h1)
    }
    assert crossers and crossers <= second
    assert crossers & (second - first)


def test_incremental_trending_sliding_matches_batch(spark, sf_dir, tmp_path):
    """Sliding windows (60m/30m): streaming append output == batch
    sliding-window aggregation restricted to watermark-closed windows;
    every interior event appears in exactly two panes."""
    from ddaugner_spark.streaming import incremental_trending

    out = incremental_trending(
        spark, f"{sf_dir}/events.parquet", str(tmp_path / "ck_tr"),
        window="60 minutes", slide="30 minutes", watermark="30 minutes",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .filter(F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert want and got == want
    # pane fan-out: total n over ALL windows (unfiltered batch) = 2x events
    total = (
        ev.groupBy(F.window("ts", "60 minutes", "30 minutes"))
        .agg(F.count("*").alias("n")).agg(F.sum("n")).first()[0]
    )
    assert total == 2 * ev.count()


def test_incremental_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join == the batch join: inner matches emit
    as both sides arrive (no watermark-close delay), so the completed
    AvailableNow run over one file must reproduce every (view, purchase)
    pair within the 24h bound, with exact integer lag/value columns."""
    from ddaugner_spark.streaming import incremental_stream_join

    got = {
        tuple(r)
        for r in incremental_stream_join(
            spark, f"{sf_dir}/events.parquet", str(tmp_path / "ck_ssj")
        ).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("purchase_value_c"),
    )
    batch = v.join(
        c,
        (v.user_id == c.c_user)
        & (c.p_ts >= v.v_ts)
        & (c.p_ts <= v.v_ts + F.expr("INTERVAL 24 HOURS")),
    ).select(
        "user_id",
        "view_id",
        "purchase_id",
        ((F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1_000_000)
        .cast("long")
        .alias("lag_s"),
        "purchase_value_c",
    )
    want = {tuple(r) for r in batch.collect()}
    assert want and got == want
