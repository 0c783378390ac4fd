"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, column names, and an order-insensitive value multiset.

The multiset is TYPE-TAGGED: an int-typed 5 and a float-typed 5.0 do
NOT compare equal. The driver's hash is representation-sensitive (the
round-1 DuckDB HUGEINT failures proved it: values matched, the driver
hash did not), so a loose `5 == 5.0` comparison here hides exactly the
class of bug the driver flags. DuckDB returns HUGEINT columns (SUM over
integers) as float64/object in pandas; cast to ::BIGINT in the oracle.

Usage: python tools/parity_check.py [--sample N] [sf_dir] [query ...]

``--sample N`` runs a deterministic per-commit subset of N queries
(seeded by git HEAD — same subset on re-runs of one commit, rotating
coverage across commits).  The full run stays the default and the
nightly gate; the sample is the fast per-commit mode (VERDICT r5 #7).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np


def _tagged(v):
    """(type_tag, canonical_value) — bool before int (bool is an int subclass)."""
    if v is None:
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "nan" if math.isnan(f) else round(f, 6))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(_tagged(x) for x in v))
    return ("s", str(v))


def normalize(rows, cols):
    out = []
    for r in rows:
        out.append(tuple((c, _tagged(r[c])) for c in cols))
    return sorted(out)


def _sampled(names, k):
    """Deterministic per-commit sample of ``k`` query names: seeded by
    the current git HEAD, so every run on one commit checks the SAME
    subset (reproducible triage) while consecutive commits rotate
    coverage — the documented fast mode (VERDICT r5 #7; the full
    411-query run stays the default and the nightly gate)."""
    import hashlib
    import random
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
    except Exception:
        head = ""
    seed = int(hashlib.md5(head.encode()).hexdigest()[:12], 16)
    names = sorted(names)
    rng = random.Random(seed)
    return set(rng.sample(names, min(k, len(names))))


def main():
    argv = list(sys.argv[1:])
    sample_n = 0
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as E
    from ddaugner_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    if sample_n and not only:
        only = _sampled(qs.keys(), sample_n)
        print(f"sampled {len(only)} of {len(qs)} queries (seed = git HEAD)")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # the driver's canonicalizer sorts/hashes the result in
            # pandas: complex-typed columns are unhashable there (the
            # round-4 q_media_decode red row) — ban them outright
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                print(f"FAIL {name}: complex-typed output columns {bad}")
                failures.append(name)
                continue
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            failures.append(name)
            continue
        drows = ddf.to_dict("records")
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            failures.append(name)
            continue
        print(f"OK   {name} ({len(srows)} rows)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
