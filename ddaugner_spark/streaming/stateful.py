"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState``.

The reference is batch-only; this is the engine's extension point for
stateful stream semantics (task mandate: "applyInPandasWithState for
custom stateful operators").  State per user: (last event micros,
running event count, running session count with a 30-minute gap rule) —
the streaming twin of the batch sessionization query
(q_events_sessions), and tested against it.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 1800 * 1_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)


def _update(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_us, n_events, n_sessions = state.get
    else:
        last_us, n_events, n_sessions = None, 0, 0

    stamps = []
    for pdf in pdfs:
        stamps.extend(int(v) for v in pdf["us"])
    stamps.sort()
    for us in stamps:
        n_events += 1
        if last_us is None or us - last_us > SESSION_GAP_US:
            n_sessions += 1
        last_us = us

    state.update((last_us if last_us is not None else 0, n_events, n_sessions))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "n_sessions": [n_sessions]}
    )


def streaming_user_sessions(
    spark: SparkSession, events_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Run the stateful sessionizer over the events table to completion
    (AvailableNow) and return the latest per-user row."""
    import os

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    path = events_dir
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    stream = reader.parquet(path).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_sessions")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends every update; keep the last row per user
    raw = spark.sql("SELECT * FROM user_sessions")
    w_max = raw.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("n_sessions").alias("n_sessions")
    )
    return w_max
