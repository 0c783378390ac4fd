"""Structured-Streaming front-end.

The reference is fully batch (SURVEY.md §2.11); the engine is
batch-first but stream-ready: the same narrow mention-detection
expressions run unchanged under ``readStream`` because they are stateless
per row.  ``Trigger.AvailableNow`` turns a parquet/Iceberg table into an
incremental catch-up run with checkpointed progress — the streaming
counterpart of the per-partition manifest resume in plans/pipeline.py.

* ``incremental_event_counts`` — watermarked windowed aggregation over the
  driver's ``events`` table (late data tolerated up to the watermark);
* ``incremental_mentions`` — the KG mention stage as a streaming map
  (stateless ⇒ append mode, no state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import mentions


def _read_stream(spark: SparkSession, path: str, schema):
    """File-stream source for either a directory or a single parquet file
    (the file source requires ``basePath`` to be a directory)."""
    import os

    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # the file-stream source only accepts directories: stream the
        # parent dir restricted to this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def incremental_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Run a watermarked windowed count over the events parquet dir to
    completion (AvailableNow) and return the result as a batch DataFrame
    read back from the sink."""
    schema = spark.read.parquet(events_dir).schema
    stream = _read_stream(spark, events_dir, schema)
    # watermarks require TIMESTAMP (LTZ); the table stores NTZ and the
    # session TZ is pinned UTC, so the cast preserves wall-clock values
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("incr_event_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM incr_event_counts")


def incremental_trending(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "60 minutes",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """SLIDING-window per-type counts (the trending-terms/metrics
    shape): each event lands in window/slide overlapping windows, so
    consecutive emitted rows give the smoothed rate a trending detector
    ratios — the one windowed-aggregation surface the tumbling
    ``incremental_event_counts`` doesn't exercise.  State is bounded by
    the watermark exactly as with tumbling windows (each event just
    updates w/s panes instead of one); append mode emits a window only
    once the watermark passes its end, so replays are idempotent."""
    schema = spark.read.parquet(events_dir).schema
    stream = _read_stream(spark, events_dir, schema)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("incr_trending")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM incr_trending")


def incremental_triples(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    out_dir: str,
) -> int:
    """Stream documents through the full map-only triple extractor into a
    parquet sink via ``foreachBatch`` — incremental KG construction.

    foreachBatch alone is only at-least-once: a crash between the sink
    write and the checkpoint offset commit replays the batch on restart.
    The write is made idempotent by keying each micro-batch to its own
    ``epoch_id=N`` directory and OVERWRITING it — a replayed epoch
    rewrites identical bytes instead of appending duplicates, restoring
    end-to-end exactly-once.  Returns total triples materialized."""
    import os

    from ..operators import triples as triples_mod

    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)

    def process(batch_df, epoch_id):
        (
            triples_mod.triples_df(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch_id={epoch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def incremental_link_scores(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Stream documents through mention detection + broadcast-gazetteer
    link scoring into per-epoch idempotent parquet (the same
    exactly-once layout as incremental_triples).  Per micro-batch the
    salted link aggregation runs over only the NEW pages' mentions; the
    final table is re-aggregable (sum of partials per entity) — the
    standard incremental-rollup contract.  Returns the merged
    (name, tag, total_score, n_mentions) aggregate across all epochs."""
    import os

    from pyspark.sql import functions as F

    from ..operators import linking, mentions as mentions_mod
    from ..sources.gazetteer import gazetteer_df

    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)

    def process(batch_df, epoch_id):
        m = mentions_mod.mentions_df(batch_df)
        ls = linking.link_scores(m, gazetteer_df(batch_df.sparkSession))
        (
            ls.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch_id={epoch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(out_dir).drop("epoch_id")
    return partials.groupBy("entity", "class").agg(
        F.sum("n_mentions").alias("n_mentions"),
        F.round(F.sum("total_score"), 4).alias("total_score"),
    )


def incremental_mentions(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    out_dir: str,
) -> int:
    """Stream the documents table through the (stateless) mention detector
    into a parquet sink with exactly-once file semantics; returns rows
    written.  Re-running with the same checkpoint is a no-op — the
    streaming analogue of manifest-based resume."""
    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)
    m = mentions.mentions_df(stream)
    q = (
        m.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def incremental_dedup(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    out_dir: str,
) -> int:
    """Streaming exact dedup with BOUNDED state: first-seen rows per
    text hash pass, later duplicates are dropped within the event-time
    watermark via ``dropDuplicatesWithinWatermark`` — state entries
    expire once the watermark passes them, which is the 10^12-document
    shape (a bare ``dropDuplicates`` grows the state store forever).
    Event time is the crawl-timestamp column of the pages input shape
    (synthesized here as a pure function of doc_id, spanning 1 h
    against a 2 h watermark so every planted duplicate lands inside
    it and the emitted hash set equals the batch distinct set — the
    oracle's ``SELECT DISTINCT md5(text)``).  Returns rows written."""
    from ..operators import dedup

    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)
    corpus = dedup.with_dup_corpus(stream)
    hashed = corpus.select(
        F.md5("text").alias("text_hash"),
        F.timestamp_seconds(
            F.lit(1_600_000_000) + (F.col("doc_id") % 3600)
        ).alias("crawl_ts"),
    ).withWatermark("crawl_ts", "2 hours")
    dd = hashed.dropDuplicatesWithinWatermark(["text_hash"]).select("text_hash")
    q = (
        dd.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def incremental_cm_sketch(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming Count-Min sketch over the document token stream —
    frequency tracking whose state is BOUNDED BY CONSTRUCTION: the
    aggregation key space is the sketch's depth×width cells (not the
    vocabulary), so the state store holds ≤ depth·width counters no
    matter how many distinct tokens ever flow past — the frequency-side
    counterpart of incremental_dedup's watermark-bounded state, and the
    reason CM (not an exact token count) is the streaming shape.  Cells
    merge by addition, so arriving micro-batches fold into the running
    table exactly as the batch operator's partials do; after an
    AvailableNow catch-up run the table equals the batch
    ``sketches.cm_sketch`` bit-for-bit (the oracle's check).

    Complete-output memory sink: the result is the full (small) sketch
    table each epoch — the shape a coordinator polls for heavy-hitter
    monitoring."""
    from ..operators.sketches import cm_bucket

    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)
    toks = stream.select(
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("token")
    ).filter(F.col("token") != "")
    fanned = toks.select(
        "token",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row_idx"),
    ).select(
        "row_idx", cm_bucket(F.col("token"), F.col("row_idx"), width).alias("bucket")
    )
    cells = fanned.groupBy("row_idx", "bucket").agg(F.count("*").alias("cnt"))
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName("incr_cm_sketch")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT row_idx, bucket, cnt FROM incr_cm_sketch")


def incremental_upsert(
    spark: SparkSession,
    base: DataFrame,
    cdc_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming CDC maintenance of the triple snapshot: micro-batches
    of change rows ``(subj, pred, obj, op, ts, support)`` fold into a
    persistent state table via
    :func:`~ddaugner_spark.operators.triples.merge_triple_state`
    (tombstones retained — the associativity requirement), one state
    VERSION per epoch.

    Exactly-once layout: epoch ``N`` reads the newest state version
    `< N` (or the base snapshot if none) and OVERWRITES
    ``state_dir/epoch_id=N`` — a replayed epoch re-reads the same
    predecessor and rewrites identical bytes, so a crash between sink
    write and offset commit cannot double-apply a batch (the same
    contract as incremental_triples).  Because the fold is associative,
    the final state is independent of how the stream was split into
    micro-batches — pinned in tests against the batch
    ``upsert_triples`` over the whole change set.

    Returns the final snapshot ``(subj, pred, obj, support, last_ts)``
    (tombstones filtered at read time).  At real scale ``state_dir`` is
    an Iceberg table and each epoch is a MERGE-INTO snapshot commit;
    the parquet-version layout is the sandbox stand-in with the same
    lineage/resume semantics.
    """
    import os

    from ..operators.triples import merge_triple_state

    def _versions():
        if not os.path.isdir(state_dir):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(state_dir)
            if d.startswith("epoch_id=")
        )

    schema = spark.read.parquet(cdc_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cdc_dir)
    )

    base_state = base.select(
        "subj",
        "pred",
        "obj",
        F.lit("u").alias("op"),
        F.col("support").cast("long").alias("support"),
        F.lit(0).cast("long").alias("last_ts"),
    )

    def process(batch_df, epoch_id):
        prev = [v for v in _versions() if v < epoch_id]
        state = (
            spark.read.parquet(os.path.join(state_dir, f"epoch_id={prev[-1]}"))
            if prev
            else base_state
        )
        new_state = merge_triple_state(state, batch_df)
        new_state.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"epoch_id={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = _versions()[-1]
    final = spark.read.parquet(os.path.join(state_dir, f"epoch_id={last}"))
    return final.filter(F.col("op") == "u").select(
        "subj", "pred", "obj", "support", "last_ts"
    )


def incremental_links(
    spark: SparkSession,
    documents_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    page_builder,
):
    """Stream documents through ``page_builder`` (docs batch → (url,
    html) pages) + hyperlink extraction + host-graph aggregation into
    per-epoch exactly-once parquet — INCREMENTAL web-graph maintenance:
    each recrawl micro-batch contributes its own (src_host, dst_host)
    partial counts, and the merged graph is one re-aggregation (sum of
    partial n_links per edge — host_graph's counts are decomposable, so
    the per-epoch layout is the standard incremental-rollup contract,
    same as incremental_link_scores).

    Returns the merged (src_host, dst_host, n_links) edge table across
    all epochs."""
    import os

    from ..operators import crawl

    schema = spark.read.parquet(documents_dir).schema
    stream = _read_stream(spark, documents_dir, schema)

    def process(batch_df, epoch_id):
        g = crawl.host_graph(crawl.extract_links(page_builder(batch_df)))
        g.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch_id={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(out_dir).drop("epoch_id")
    return partials.groupBy("src_host", "dst_host").agg(
        F.sum("n_links").cast("long").alias("n_links")
    )


def incremental_attribution(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    attribution_window: str = "6 hours",
    watermark: str = "7 hours",
) -> DataFrame:
    """STREAM-STREAM interval join (the ad-attribution shape from the
    Structured Streaming join taxonomy): every 'purchase' joins the
    same user's preceding 'view' events within ``attribution_window``.
    Both sides are watermarked, so Spark's join state store evicts a
    buffered row as soon as the other side's watermark proves it can
    never match again — bounded state by construction, the property
    that separates a streaming interval join from an unbounded
    cross-buffer.  ``watermark`` must cover the attribution window (set
    here: 7h > 6h) or in-window matches could be dropped; with that
    margin the append-mode output equals the batch interval join for
    ANY micro-batch split (replay-pinned in tests).

    Runs to completion with AvailableNow against the events parquet,
    appending matches to the ``out_dir`` parquet sink (a FILE sink —
    the memory sink cannot recover from a checkpoint, so catch-up runs
    would be impossible), and returns the sink read back as the full
    joined (user_id, view_id, purch_id) table.
    """
    schema = spark.read.parquet(events_dir).schema
    views = (
        _read_stream(spark, events_dir, schema)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        _read_stream(spark, events_dir, schema)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purch_id"),
            F.col("ts").cast("timestamp").alias("purch_ts"),
        )
        .withWatermark("purch_ts", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purch_ts") > F.col("view_ts"))
        & (
            F.col("purch_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        F.col("v_user").cast("long").alias("user_id"),
        F.col("view_id").cast("long").alias("view_id"),
        F.col("purch_id").cast("long").alias("purch_id"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def incremental_ohlc(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming OHLC bars: the packed-key argmin/argmax candlestick
    aggregate (temporal.ohlc_bars) run as a watermarked windowed
    streaming aggregation — open/close are ``min``/``max`` of the
    (epoch_us, event_id, cents) lpad key, which are DECOMPOSABLE, so
    the incremental state per (window, series) is one key pair + four
    scalars and late data folds in exactly like batch.  AvailableNow to
    completion; append mode emits the windows the final watermark
    closed (window_end ≤ max ts − watermark), as in
    incremental_event_counts."""
    schema = spark.read.parquet(events_dir).schema
    stream = _read_stream(spark, events_dir, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
        # width 12: lpad truncates wider inputs — see temporal.ohlc_bars
        F.lpad(cents.cast("string"), 12, "0"),
    )
    slot = lambda col: F.substring(col, 31, 12).cast("long")  # noqa: E731
    agg = (
        stream.withColumn("k", key)
        .withColumn("c", cents)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min("k").alias("ok"),
            F.max("c").alias("high_c"),
            F.min("c").alias("low_c"),
            F.max("k").alias("ck"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("sum_c"),
        )
        .select(
            F.col("event_type").alias("series"),
            F.expr("unix_micros(w.start) DIV 1000000").alias("bucket"),
            slot(F.col("ok")).alias("open_c"),
            "high_c",
            "low_c",
            slot(F.col("ck")).alias("close_c"),
            "n",
            "sum_c",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("incr_ohlc")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM incr_ohlc")


def incremental_stream_join(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    left_type: str = "view",
    right_type: str = "purchase",
    max_delay: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (the attribution-join
    shape: every ``left_type`` event matched to the same user's
    ``right_type`` events within ``max_delay`` after it) run to
    completion under AvailableNow and returned as a batch DataFrame —
    ``(user_id, view_id, purchase_id, lag_s, purchase_value_c)``.

    This is the one stateful-streaming surface the repo's other
    incremental operators don't exercise: TWO unbounded inputs joined
    with symmetric state.  Both sides carry a watermark and the join
    condition carries an explicit time range (``p_ts`` in
    ``[v_ts, v_ts + max_delay]``), which is what lets Spark expire
    buffered rows — left state older than
    ``watermark + max_delay``, right state older than ``watermark`` —
    so state is bounded regardless of stream length.  Inner-join
    matches emit as soon as both sides arrive (no watermark-close
    delay), so the completed run equals the batch join exactly; the
    oracle is that batch join.  At crawl scale both sides shuffle on
    the equality key (user_id) only — the range predicate is evaluated
    inside the per-key state store, never as a fan-out.

    Integer outputs only: lag in whole seconds (micros floor-div) and
    the purchase value in cents, per the repo's no-float-compare rule.
    """
    schema = spark.read.parquet(events_dir).schema

    def side(event_type: str, prefix: str) -> DataFrame:
        s = _read_stream(spark, events_dir, schema)
        s = s.where(F.col("event_type") == event_type)
        return s.select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
            F.round(F.col("value") * 100).cast("long").alias(f"{prefix}_value_c"),
        ).withWatermark(f"{prefix}_ts", watermark)

    left = side(left_type, "v")
    right = side(right_type, "p")
    joined = left.join(
        right,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts AND "
            f"p_ts <= v_ts + INTERVAL {max_delay}"
        ),
        "inner",
    )
    out = joined.select(
        F.col("v_user").alias("user_id"),
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        ((F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1_000_000)
        .cast("long")
        .alias("lag_s"),
        F.col("p_value_c").alias("purchase_value_c"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("incr_stream_join")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM incr_stream_join")
