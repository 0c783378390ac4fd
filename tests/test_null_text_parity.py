"""Null/empty-text parity: a real crawl carries null and empty text rows;
the Spark queries and their DuckDB oracles must agree on them.

Round-1 advice flagged this as a latent break: mentions.with_tokens maps
''/NULL to an empty token array while DuckDB string_split('', ' ')
yields [''] and NULL propagates. The oracle CTEs now encode the same
normalization; this test pins it on a corpus that actually contains
such rows (the synthetic testdata has none).
"""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as E

# queries whose oracle only needs the documents table and whose text
# handling is affected by null/empty rows
QUERIES = ["q_tokenize", "q_sentences", "q_mentions", "q_quality",
           "q_token_counts", "q_fingerprints", "q_triples"]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory, spark, sf_dir):
    """sf0.001 documents plus one empty-text and one null-text row."""
    out = tmp_path_factory.mktemp("dirty_sf")
    base = pq.read_table(f"{sf_dir}/documents.parquet")
    extra = pa.table({
        "doc_id": pa.array([900001, 900002], pa.int64()),
        "text": pa.array(["", None], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["crawl", "crawl"], pa.string()),
        "n_chars": pa.array([0, 0], pa.int64()),
    })
    pq.write_table(
        pa.concat_tables([base.select(extra.column_names), extra]),
        str(out / "documents.parquet"),
    )
    return str(out)


def _tag(v):
    if v is None:
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "nan" if math.isnan(f) else round(f, 6))
    return ("s", str(v))


@pytest.mark.parametrize("name", QUERIES)
def test_null_and_empty_text_parity(spark, dirty_sf, name):
    sdf = E.queries()[name](spark, dirty_sf)
    srows = [r.asDict() for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{dirty_sf}/documents.parquet'"
    )
    ddf = con.sql(E.oracle_sql()[name]).df()
    drows = ddf.to_dict("records")
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(srows) == len(drows)
    cols = sorted(sdf.columns)
    ns = sorted(tuple((c, _tag(r[c])) for c in cols) for r in srows)
    nd = sorted(tuple((c, _tag(r[c])) for c in cols) for r in drows)
    assert ns == nd
