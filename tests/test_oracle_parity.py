"""In-suite mirror of the driver's DuckDB-oracle gate on a fast,
representative query subset (the full 39-query gate runs via
tools/parity_check.py; this keeps `pytest -x -q` self-contained)."""

import math

import duckdb
import pytest

import __spark_entry__ as E

FAST_QUERIES = [
    "q_mentions",
    "q_triples",
    "q_entity_link",
    "q_canonical_cc",
    "q_ner_score",
    "q_dedup_exact",
    "q_ann_topk",
    "q_quality",
    "q_error_spans",
]


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append((c, v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = E.queries()[name](spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    ddf = duck.sql(E.oracle_sql()[name]).df()
    drows = ddf.to_dict("records")
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(srows) == len(drows)
    cols = sorted(sdf.columns)
    assert _normalize(srows, cols) == _normalize(drows, cols)
