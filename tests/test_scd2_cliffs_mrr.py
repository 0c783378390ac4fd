"""SCD2 validity intervals (operators/crawl.py scd2_intervals),
Cliff's δ (operators/stats.py cliffs_delta), MRR@k
(operators/similarity.py mrr_at_k).

The sf gate replays each against its SQL twin; pinned here: a
hand-built recrawl stream with no-op recrawls and an A→B→A flip, a
brute-force row-pair δ plus the Mann–Whitney identity, and a
constructed embedding set with a known first-relevant rank.
"""

import datetime

import pytest

from ddaugner_spark.operators.crawl import scd2_intervals
from ddaugner_spark.operators.similarity import mrr_at_k
from ddaugner_spark.operators.stats import cliffs_delta


def _ts(i):
    return datetime.datetime(2024, 1, 1, 0, i)


class TestScd2:
    def test_collapse_and_flip(self, spark):
        rows = [
            # k1: A A B A -> versions A(1..3) B(3..4) A(4..EOT)
            ("k1", _ts(1), "A"),
            ("k1", _ts(2), "A"),
            ("k1", _ts(3), "B"),
            ("k1", _ts(4), "A"),
            # k2: single capture -> one current row
            ("k2", _ts(9), "Z"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        out = {
            (r.url, r.version): r
            for r in scd2_intervals(df).collect()
        }
        assert len(out) == 4
        v1, v2, v3 = out[("k1", 1)], out[("k1", 2)], out[("k1", 3)]
        assert (v1.valid_from, v1.valid_to) == (_ts(1), _ts(3))
        assert (v2.valid_from, v2.valid_to) == (_ts(3), _ts(4))
        assert v3.valid_from == _ts(4) and v3.is_current
        assert v3.valid_to == datetime.datetime(9999, 12, 31)
        assert not v1.is_current and not v2.is_current
        # the A->B->A flip produces DISTINCT versions with the SAME hash
        assert v1.payload_hash == v3.payload_hash != v2.payload_hash
        assert out[("k2", 1)].is_current

    def test_intervals_partition_time(self, spark):
        """valid_from/valid_to chain: each version's valid_to equals
        the next version's valid_from (half-open, no gaps/overlap)."""
        rows = [("k", _ts(i), f"p{i % 3}") for i in range(7)]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string"
        )
        got = sorted(scd2_intervals(df).collect(), key=lambda r: r.version)
        for a, b in zip(got, got[1:]):
            assert a.valid_to == b.valid_from
        assert got[-1].is_current and not any(r.is_current for r in got[:-1])
        # no NULLs anywhere (pandas-canonicalizer contract)
        assert all(
            None not in (r.valid_from, r.valid_to, r.payload_hash)
            for r in got
        )


class TestCliffsDelta:
    def test_matches_row_pair_brute_force(self, spark):
        a = [1, 4, 4, 7, 9]
        b = [2, 4, 5, 5]
        rows = [("A", v) for v in a] + [("B", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v long")
        got = cliffs_delta(df, "g", "v", "A", "B").collect()[0]
        gt = sum(1 for x in a for y in b if x > y)
        lt = sum(1 for x in a for y in b if x < y)
        eq = sum(1 for x in a for y in b if x == y)
        assert (got.n_gt, got.n_lt, got.n_eq) == (gt, lt, eq)
        assert got.delta == pytest.approx(
            (gt - lt) / (len(a) * len(b)), abs=1e-6
        )
        # Mann–Whitney identity: U_a = gt + eq/2, delta = 2U/(nm) - 1
        u = gt + eq / 2
        assert got.delta == pytest.approx(
            2 * u / (len(a) * len(b)) - 1, abs=1e-6
        )

    def test_full_dominance(self, spark):
        rows = [("A", v) for v in (10, 11)] + [("B", v) for v in (1, 2)]
        df = spark.createDataFrame(rows, "g string, v long")
        assert cliffs_delta(df, "g", "v", "A", "B").collect()[0].delta == 1.0


class TestMrr:
    def _emb(self, spark, labels):
        # vec 0 is the query; vec i has embedding [1, 1/(i+1)] so the
        # dot ranking against [1, 1] is exactly by index: 1, 2, 3, ...
        rows = [
            (i, lab, [1.0, 1.0 if i == 0 else 1.0 / (i + 1)])
            for i, lab in enumerate(labels)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<double>"
        )

    def test_first_relevant_rank(self, spark):
        # ranks 1..4 = vecs 1..4; first label match at vec 3 -> rank 3
        df = self._emb(spark, [7, 1, 2, 7, 7])
        got = mrr_at_k(df, [0], k=10).collect()[0]
        assert (got.query_id, got.n_rel) == (0, 2)
        assert got.first_rel_rank == 3
        assert got.rr == pytest.approx(1 / 3, abs=1e-6)

    def test_miss_is_zero_sentinel(self, spark):
        df = self._emb(spark, [7, 1, 2, 3, 4])
        got = mrr_at_k(df, [0], k=10).collect()[0]
        assert got.n_rel == 0
        assert got.first_rel_rank == 0 and got.rr == 0.0
