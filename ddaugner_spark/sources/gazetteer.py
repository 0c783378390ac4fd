"""Gazetteer source (reference: resources/*.py name lists, SURVEY.md S5).

The gazetteer is tiny (reference: ≤35k names across all lists), so it is
always the broadcast side of every join — ``F.broadcast`` is applied at
creation so no downstream caller can accidentally shuffle it.  At 100 TB
the pages side streams through a broadcast-hash join with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GAZETTEER


def gazetteer_df(spark: SparkSession, entries=None) -> DataFrame:
    """(name, class, weight, n_tokens) broadcast dimension."""
    entries = entries if entries is not None else GAZETTEER
    df = spark.createDataFrame(entries, schema="name string, class string, weight double")
    df = df.withColumn("n_tokens", F.size(F.split(F.col("name"), " ")))
    return F.broadcast(df)
