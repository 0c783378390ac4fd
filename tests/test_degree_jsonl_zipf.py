"""Session-9 batch 7: degree histogram (graph.degree_distribution),
reciprocity (graph.reciprocity), JSONL export (sources/jsonl.py), Zipf
fit (textstats.zipf_fit)."""

import json
import math

import pytest

from ddaugner_spark.operators import graph, textstats
from ddaugner_spark.sources.jsonl import to_jsonl


def test_degree_distribution_buckets(spark):
    # star: hub deg 5 (bucket 2), rims deg 1 (bucket 0)
    e = spark.createDataFrame(
        [("h", f"r{i}") for i in range(5)], "a string, b string"
    )
    got = {r["bucket"]: (r["min_deg"], r["n_nodes"])
           for r in graph.degree_distribution(e).collect()}
    assert got == {0: (1, 5), 2: (4, 1)}


def test_reciprocity(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c")],
        "src string, dst string",
    )
    r = graph.reciprocity(e).collect()[0]
    # self-loop excluded; a<->b reciprocal (2 edges), a->c not
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity"] == pytest.approx(round(2 / 3, 6))


def test_jsonl_lines_parse_and_escape(spark):
    docs = spark.createDataFrame(
        [(1, 10, "en", "web", 'say "hi"\nback\\slash\ttab'),
         (2, 0, None, "web", None)],
        "doc_id long, n_chars long, lang string, source string, text string",
    )
    got = {r["doc_id"]: r["line"] for r in
           to_jsonl(docs, ["lang", "source", "text"], ["doc_id", "n_chars"]).collect()}
    o1 = json.loads(got[1])
    assert o1 == {"doc_id": 1, "n_chars": 10, "lang": "en", "source": "web",
                  "text": 'say "hi"\nback\\slash\ttab'}
    o2 = json.loads(got[2])
    assert o2["lang"] is None and o2["text"] is None
    # key order is deterministic (int cols first, declared order)
    assert got[1].startswith('{"doc_id":1,"n_chars":10,"lang":')


def test_zipf_fit_exact_power_law(spark):
    # synthetic corpus with freq(rank r) = 2^(7-r) for 6 words:
    # ln f = 7ln2 - r·ln2 ... slope of ln f on ln RANK is not exactly -1,
    # so instead build freq = K / rank exactly: rank 1..4 with freq 12/r
    words = []
    for r, w in enumerate(["w1", "w2", "w3", "w4"], start=1):
        words += [w] * (12 // r)  # 12, 6, 4, 3
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    out = textstats.zipf_fit(docs, top_n=4).collect()[0]
    # freq = 12/r exactly -> ln f = ln 12 - ln r -> slope -1, intercept ln12
    assert out["n"] == 4
    assert out["slope"] == pytest.approx(-1.0, abs=1e-4)
    assert out["intercept"] == pytest.approx(math.log(12) * 1e6, rel=1e-4)
