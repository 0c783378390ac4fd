"""Physical-plan pins for session-13 operators — the docstring claims
('map-only', 'broadcast', 'no row-sized sort') asserted against the
optimized plan, the test_bigdict discipline.
"""

from pyspark.sql import functions as F

from ddaugner_spark.operators.events import item_recs
from ddaugner_spark.operators.stats import benford_digits, skew_report
from ddaugner_spark.operators.textstats import lexicon_screen


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lexicon_screen_is_map_only(spark):
    docs = spark.createDataFrame([(0, "fast slow x")], ["doc_id", "text"])
    plan = _plan(lexicon_screen(docs, {"fast": 1000, "slow": -1000}))
    # the claim: one scan-local pass — no exchange, no join, no sort
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Sort" not in plan


def test_benford_single_aggregate_plus_broadcast_total(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 50)], ["value"])
    plan = _plan(benford_digits(df, "value"))
    # the 1-row total joins in as a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_skew_report_no_row_sort(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    plan = _plan(skew_report(df, "k"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan  # the 1-row totals table


def test_item_recs_broadcasts_item_dimensions(spark):
    import json

    rows = [(i, "2024-01-01", i % 3, "view", 1.0, json.dumps({"k": i % 5}))
            for i in range(30)]
    ev = spark.createDataFrame(
        rows,
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _plan(item_recs(ev))
    # item-count and similarity dimensions go in as broadcasts
    assert "BroadcastExchange" in plan
