"""Round-5 session-9 operators: autocorrelation, t-closeness,
naive-Bayes langid, nDCG@k (+ smoke for the TPC-H Q9/Q19 shapes).

Each test pins the closed-form value on a micro-fixture small enough to
verify by hand; engine↔oracle parity at corpus scale is pinned by
tools/parity_check.py (q_acf, q_t_closeness, q_naive_bayes, q_ndcg,
q_product_profit, q_disjunctive_revenue).
"""

import datetime as dt
import math

from pyspark.sql import functions as F

from ddaugner_spark.operators.privacy import t_closeness
from ddaugner_spark.operators.similarity import ndcg_at_k
from ddaugner_spark.operators.temporal import autocorrelation
from ddaugner_spark.operators.textstats import naive_bayes_langid


def _events(spark, rows):
    """rows: (ts_hour_offset, event_type, value)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=h), 1, t, float(v), "{}")
            for i, (h, t, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_acf_alternating_series(spark):
    # hourly counts [2, 0, 2] (spine spans min..max observed bucket):
    # mean 4/3, devs [2/3, -4/3, 2/3], den 24/9
    # lag1: 2*(2/3)(-4/3) = -16/9 -> r = -2/3 ; lag2: 4/9 -> r = 1/6
    # lag3: no pairs -> no row
    rows = [(0, "a", 1.0), (0, "a", 1.0), (2, "a", 1.0), (2, "a", 1.0)]
    out = {r.lag: r for r in autocorrelation(_events(spark, rows), max_lag=3).collect()}
    assert sorted(out) == [1, 2]
    assert out[1].n_buckets == 3
    assert out[1].r == round(-2 / 3, 6)
    assert out[2].r == round(1 / 6, 6)


def test_acf_zero_fills_gaps(spark):
    # events only in hours 0 and 3 -> spine covers the empty hours 1-2
    rows = [(0, "a", 1.0), (3, "a", 1.0)]
    out = autocorrelation(_events(spark, rows), max_lag=1).collect()
    assert out[0].n_buckets == 4


def test_t_closeness_emd(spark):
    # type a: 2 events in bucket 0; type b: 2 events in bucket 1
    # global q = [.5, .5, 0...]; class a cum diffs: .5 at bucket 0, 0 after
    rows = [(0, "a", 0.0), (0, "a", 1.0), (0, "b", 5.0), (0, "b", 6.0)]
    out = {r.event_type: r for r in t_closeness(_events(spark, rows)).collect()}
    assert out["a"].n == 2
    assert out["a"].emd == round(0.5 / 9, 6)
    assert out["a"].t_close == (round(0.5 / 9, 6) <= 0.2)
    # identical-to-global distribution -> emd 0, t-close
    rows_uniform = [(0, "a", 0.0), (0, "b", 0.0)]
    out2 = {r.event_type: r for r in t_closeness(_events(spark, rows_uniform)).collect()}
    assert out2["a"].emd == 0.0 and bool(out2["a"].t_close)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, l, "src", len(t)) for i, (t, l) in enumerate(rows)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_naive_bayes_separable(spark):
    # even ids train: en says a/b, fr says c/d; odd ids test
    rows = [
        ("a a b", "en"),   # 0 train en
        ("a b", "en"),     # 1 test -> en
        ("c c d", "fr"),   # 2 train fr
        ("c d", "fr"),     # 3 test -> fr
    ]
    out = {r.doc_id: r for r in naive_bayes_langid(_docs_df(spark, rows)).collect()}
    assert out[1].pred_lang == "en" and out[1].true_lang == "en"
    assert out[3].pred_lang == "fr"
    # prior+likelihood closed form for doc 1 under en:
    # ln(1/2) + ln((2+1)/(3+4)) + ln((1+1)/(3+4))
    want = round(math.log(0.5) + math.log(3 / 7) + math.log(2 / 7), 4)
    assert out[1].score == want


def test_naive_bayes_tokenless_test_doc_drops(spark):
    rows = [("a", "en"), ("", "en"), ("b", "fr"), ("x", "fr")]
    out = naive_bayes_langid(_docs_df(spark, rows)).collect()
    assert sorted(r.doc_id for r in out) == [3]


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(v, [float(x) for x in e], l) for v, e, l in rows],
        ["vec_id", "embedding", "label"],
    )


def test_ndcg_closed_form(spark):
    # query 0 (label 1): candidates ranked by integer dot:
    #   vec 1 (rel, dot 1000000), vec 2 (not rel, 900000), vec 3 (rel, 0)
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.0], 1),
        (2, [0.9, 0.0], 0),
        (3, [0.0, 1.0], 1),
    ]
    out = ndcg_at_k(_emb_df(spark, rows), [0], k=10).collect()[0]
    dcg = round(1 / math.log2(2) + 1 / math.log2(4), 6)
    idcg = round(1 / math.log2(2) + 1 / math.log2(3), 6)
    assert out.n_rel == 2
    assert out.dcg == dcg
    assert out.idcg == idcg
    assert out.ndcg == round(dcg / idcg, 6)


def test_ndcg_no_relevant(spark):
    rows = [(0, [1.0, 0.0], 1), (1, [0.5, 0.0], 2), (2, [0.1, 0.0], 3)]
    out = ndcg_at_k(_emb_df(spark, rows), [0], k=10).collect()[0]
    assert (out.n_rel, out.dcg, out.idcg, out.ndcg) == (0, 0.0, 0.0, 0.0)


def test_tpch_shapes_smoke(spark, sf_dir):
    import __spark_entry__ as E

    pp = E.q_product_profit(spark, sf_dir)
    assert pp.columns == ["nation", "o_year", "sum_profit"]
    assert pp.count() > 0
    dr = E.q_disjunctive_revenue(spark, sf_dir).collect()
    assert len(dr) == 1 and dr[0].n_lines >= 0


def test_t_closeness_negative_values_clamp_to_bottom_bucket(spark):
    # regression: floor(value/5) on a negative value used to produce
    # bucket −1, off the 0..9 spine, silently dropping the rows from
    # both distributions; greatest(0, …) clamps them into bucket 0
    rows = [(0, "a", -3.0), (0, "a", -1.0), (0, "b", 5.0), (0, "b", 6.0)]
    out = {r.event_type: r for r in t_closeness(_events(spark, rows)).collect()}
    assert out["a"].n == 2
    assert out["a"].emd == round(0.5 / 9, 6)
