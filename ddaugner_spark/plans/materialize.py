"""Partitioned materialization with an Iceberg-first, parquet-fallback
path.

north_star materializes to "partitioned Iceberg triple tables" with
partition transforms like ``days(warc_ts)`` + ``bucket(url)``.  The
Iceberg runtime jar is not in this sandbox image, so the Iceberg branch
is attempted and gated: if the catalog/`writeTo` path is unavailable the
same data lands as dynamic-partition-overwrite parquet with identical
partition columns — preserving the per-partition resume unit.  On a real
cluster, add

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog

and `materialize(df, "kg.db.triples", ...)` takes the Iceberg branch
unchanged.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def select_branch(table: Optional[str], available: bool) -> str:
    """The materialize() sink decision, factored pure so both branches
    are pinnable in a sandbox without the Iceberg runtime (VERDICT r5
    #8): Iceberg iff a table name is given AND the runtime is present;
    bare-path or runtime-less writes take the parquet fallback."""
    return "iceberg" if (table and available) else "parquet"


def materialize(
    df: DataFrame,
    target: str,
    partition_cols: List[str],
    mode: str = "overwrite",
    table: Optional[str] = None,
) -> str:
    """Write ``df`` partitioned by ``partition_cols``.

    If ``table`` names an Iceberg table and the runtime is present, use
    ``writeTo(table).partitionedBy(...)``; otherwise parquet at
    ``target`` with the same partition columns and dynamic partition
    overwrite (idempotent per-partition rewrites → safe resume).
    Returns the branch taken ('iceberg' | 'parquet')."""
    spark = df.sparkSession
    if select_branch(table, iceberg_available(spark)) == "iceberg":
        from pyspark.sql.functions import col

        writer = df.writeTo(table).partitionedBy(*[col(c) for c in partition_cols])
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return "iceberg"

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(target)
    return "parquet"


def roundtrip_small(
    df: DataFrame, stage_dir: Optional[str], prefix: str
) -> DataFrame:
    """Parquet round-trip a SMALL derived table (contingency cells,
    per-group counts) that downstream fans out over several branches:
    without it Catalyst re-runs the corpus-touching scan+aggregate once
    PER BRANCH (a 4-branch fold = 4 corpus passes at 100 TB); after it
    every branch re-reads the dimension-sized parquet.  Round-trips,
    not localCheckpoint, per the repo's measured rule (docs/PLANS.md).
    Owns and atexit-cleans a temp dir when ``stage_dir`` is None.
    """
    if stage_dir is None:
        import atexit
        import shutil
        import tempfile

        stage_dir = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)
    df.write.mode("overwrite").parquet(f"{stage_dir}/t")
    return df.sparkSession.read.parquet(f"{stage_dir}/t")
