"""Training-data assembly operators (operators/traindata.py)."""

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators import traindata


def _docs(spark, rows):
    """rows: (doc_id, text[, lang, source]) -> documents-shaped frame."""
    full = [
        (r + ("en", "s0"))[:4] if len(r) == 2 else r for r in rows
    ]
    df = spark.createDataFrame(full, ["doc_id", "text", "lang", "source"])
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_pack_sequences_bins_and_straddle(spark):
    # one shard (ids ≡ 0 mod 4); docs of 3, 4, 5 tokens, seq_len 8:
    # cum_excl 0, 3, 7 -> bins 0, 0, 0; doc3 spans tokens 7..11 -> straddles
    rows = [(0, "a b c"), (4, "a b c d"), (8, "a b c d e")]
    out = traindata.pack_sequences(_docs(spark, rows), seq_len=8, n_shards=4)
    got = {(r.shard, r.bin_id): r for r in out.collect()}
    assert set(got) == {(0, 0)}
    r = got[(0, 0)]
    assert (r.n_docs, r.n_tokens, r.n_straddle) == (3, 12, 1)


def test_pack_sequences_exact_boundary_not_straddle(spark):
    # 8-token doc exactly fills bin 0; next doc starts bin 1
    rows = [(0, " ".join("x" * 1 for _ in range(8))), (4, "a b")]
    out = traindata.pack_sequences(_docs(spark, rows), seq_len=8, n_shards=4)
    got = {(r.shard, r.bin_id): (r.n_docs, r.n_straddle) for r in out.collect()}
    assert got == {(0, 0): (1, 0), (0, 1): (1, 0)}


def test_chunk_windows_boundaries(spark):
    # 10 tokens, size 4, stride 4: chunks at 0,4,8; last has 2 tokens
    text = " ".join(f"t{i}" for i in range(10))
    out = traindata.chunk_windows(_docs(spark, [(1, text)]), size=4, stride=4)
    rows = sorted(out.collect(), key=lambda r: r.start_pos)
    assert [(r.chunk_id, r.start_pos, r.n_chunk_tokens) for r in rows] == [
        (0, 0, 4),
        (1, 4, 4),
        (2, 8, 2),
    ]
    assert rows[2].chunk_text == "t8 t9"


def test_chunk_windows_overlap(spark):
    text = " ".join(f"t{i}" for i in range(6))
    out = traindata.chunk_windows(_docs(spark, [(1, text)]), size=4, stride=2)
    rows = sorted(out.collect(), key=lambda r: r.start_pos)
    assert [r.chunk_text for r in rows] == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5",
    ]


def test_mixture_weights_uniform_target(spark):
    # source a: 1 token; source b: 3 tokens -> weights 2.0 and 2/3
    rows = [(1, "x", "en", "a"), (2, "x y z", "en", "b")]
    out = traindata.mixture_weights(_docs(spark, rows))
    got = {r.source: r for r in out.collect()}
    assert got["a"].actual_share == pytest.approx(0.25)
    assert got["a"].target_share == pytest.approx(0.5)
    assert got["a"].weight == pytest.approx(2.0)
    assert got["b"].weight == pytest.approx(0.666667, abs=1e-6)


def _scored(spark, pairs):
    return spark.createDataFrame(pairs, ["y", "s"])


def _auc(spark, pairs):
    df = _scored(spark, pairs)
    return traindata.auc_exact(
        df, label=F.col("y") == 1, score=F.col("s")
    ).collect()[0]


def test_auc_perfect_and_reversed(spark):
    r = _auc(spark, [(1, 10), (1, 9), (0, 2), (0, 1)])
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    r = _auc(spark, [(0, 10), (0, 9), (1, 2), (1, 1)])
    assert r.auc == 0.0


def test_auc_ties_half_credit(spark):
    # all scores equal -> AUC exactly 0.5
    r = _auc(spark, [(1, 5), (1, 5), (0, 5), (0, 5)])
    assert r.auc == pytest.approx(0.5)


def test_auc_degenerate_sentinel(spark):
    r = _auc(spark, [(1, 3), (1, 7)])
    assert (r.n_neg, r.auc) == (0, 0.5)


def test_auc_hand_value(spark):
    # pos scores {3, 1}, neg scores {2, 1}:
    # pairs: (3>2)=1, (3>1)=1, (1<2)=0, (1=1)=0.5 -> 2.5/4 = 0.625
    r = _auc(spark, [(1, 3), (1, 1), (0, 2), (0, 1)])
    assert r.auc == pytest.approx(0.625)


def test_calibration_bins_and_ece(spark):
    # bin 0: caps {10, 30}, one positive -> avg 0.04, rate 0.5
    rows = [
        (1, "x" * 10, "en", "a"),
        (2, "x" * 30, "de", "a"),
        (3, "x" * 490, "en", "a"),
    ]
    d = _docs(spark, rows)
    out = traindata.calibration_bins(d, n_bins=10)
    got = {r.bin: r for r in out.collect()}
    b0 = got[0]
    assert (b0.n, b0.n_pos) == (2, 1)
    assert b0.avg_score == pytest.approx(0.04)
    assert b0.pos_rate == pytest.approx(0.5)
    assert b0.abs_gap == pytest.approx(0.46)
    b9 = got[9]
    assert (b9.n, b9.n_pos) == (1, 1)
    assert b9.abs_gap == pytest.approx(0.02)
    # ECE = (|40-500| + |490-500|) / (500*3) = 470/1500
    assert b0.ece == pytest.approx(470 / 1500, abs=1e-6)
    assert b9.ece == b0.ece


def test_calibration_bins_width_follows_n_bins(spark):
    rows = [(1, "x" * 120, "en", "a"), (2, "x" * 480, "de", "a")]
    out = traindata.calibration_bins(_docs(spark, rows), n_bins=5)
    # width 100: caps 120 and 480 land in bins 1 and 4
    assert {r.bin for r in out.collect()} == {1, 4}
    with pytest.raises(ValueError):
        traindata.calibration_bins(_docs(spark, rows), n_bins=7)


def test_auc_null_label_counts_as_negative(spark):
    df = spark.createDataFrame(
        [(True, 3), (None, 1), (False, 2)], ["y", "s"]
    )
    r = traindata.auc_exact(df, label=F.col("y"), score=F.col("s")).collect()[0]
    # NULL label is a negative (oracle CASE semantics): n_neg = 2
    assert (r.n_pos, r.n_neg) == (1, 2)
    assert r.auc == pytest.approx(1.0)


def test_greedy_coverage_python_replay(spark, tmp_path):
    """Exact round-by-round equality with the sequential greedy
    (3-gram shingle universe, min-doc_id tie-break), including the
    early stop when everything is covered."""
    rows = [
        (0, "a b c d e f"),
        (1, "a b c d e f g h"),      # superset of 0's shingles + more
        (2, "x y z w v"),
        (3, "x y z"),
        (4, "p q r s"),
        (5, "a b c"),                # fully inside 1
    ]
    got = [
        (r["rank"], r["doc_id"], r["gain"])
        for r in traindata.greedy_coverage(
            _docs(spark, rows), k=10, stage_dir=str(tmp_path / "cov")
        ).collect()
    ]
    got.sort()

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    uni = {d: sh(t) for d, t, *_ in [(r[0], r[1]) for r in rows]}
    covered, want, rank = set(), [], 0
    while True:
        gains = {d: len(s - covered) for d, s in uni.items() if s - covered}
        if not gains:
            break
        best = min(gains, key=lambda d: (-gains[d], d))
        want.append((rank, best, gains[best]))
        covered |= uni[best]
        rank += 1
    assert got == want
    # sanity on the fixture: selection is 1 (8 shingles... covers 0,5),
    # then 2, then 4, then 3 contributes nothing
    assert [d for _, d, _ in want][:3] == [1, 2, 4]
