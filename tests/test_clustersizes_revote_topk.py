"""Round-5 session-10 batch 8: cluster-size histogram, reliability-
weighted re-voting, top-k + OTHER rollup.

Micro-fixtures with hand-computed values; corpus-scale engine↔oracle
parity pinned by tools/parity_check.py (q_cluster_sizes, q_revote,
q_topk_others).
"""

from ddaugner_spark.operators.dedup import cluster_size_histogram
from ddaugner_spark.operators.scoring import weighted_revote
from ddaugner_spark.operators.stats import topk_others


def test_cluster_size_histogram(spark):
    comps = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"), ("f", "f")],
        ["entity", "component"],
    )
    out = {r.size: r for r in cluster_size_histogram(comps).collect()}
    assert out[3].n_clusters == 1 and out[3].n_docs == 3
    assert out[2].n_clusters == 1
    assert out[1].n_clusters == 1
    assert out[3].pct_docs == 0.5


def test_weighted_revote_reliable_raters_win(spark):
    # items 0..8: raters r1, r2 always vote A; r3 votes B
    # item 9: r1 votes B, r2 and r3 vote A -> majority A
    rows = []
    for i in range(9):
        rows += [(i, "r1", "A"), (i, "r2", "A"), (i, "r3", "B")]
    rows += [(9, "r1", "B"), (9, "r2", "A"), (9, "r3", "A")]
    out = {
        r.rater: r
        for r in weighted_revote(
            spark.createDataFrame(rows, ["item", "rater", "lab"]),
            ["item"],
            "rater",
            "lab",
        ).collect()
    }
    # majorities are all A; agreements: r1 9/10, r2 10/10, r3 1/10
    assert out["r2"].n_agree == 10 and out["r1"].n_agree == 9
    assert out["r3"].n_agree == 1
    # acc = (agree+1)/(n+2) in milli
    assert out["r2"].acc_milli == round(1e6 * 11 / 12)
    assert out["r3"].acc_milli == round(1e6 * 2 / 12)
    # weighted revote keeps A everywhere (reliable raters agree) ->
    # nothing relabeled
    assert out["r1"].n_relabeled == 0


def test_weighted_revote_flips_unreliable_majority(spark):
    # two unreliable raters (often disagree with majority over many
    # items) team up on item X against one reliable rater
    rows = []
    # 10 calibration items: r_good matches r_a; r_b and r_c disagree
    # with everyone (so majority = the r_good/r_a label)
    for i in range(10):
        rows += [
            (i, "good1", "A"), (i, "good2", "A"),
            (i, "bad1", "B"), (i, "bad2", "C"),
        ]
    # item 99: bad raters gang up on "Z", goods say "A" -> raw majority
    # by count is tie 2-2? no: Z has 2 votes, A has 2 votes -> tie ->
    # lexicographic min = A; weighted vote: goods outweigh bads -> A
    rows += [
        (99, "good1", "A"), (99, "good2", "A"),
        (99, "bad1", "Z"), (99, "bad2", "Z"),
    ]
    out = weighted_revote(
        spark.createDataFrame(rows, ["item", "rater", "lab"]),
        ["item"],
        "rater",
        "lab",
    ).collect()
    assert all(r.n_relabeled == 0 for r in out)
    accs = {r.rater: r.acc_milli for r in out}
    assert accs["good1"] > accs["bad1"]


def test_topk_others_fold(spark):
    rows = (
        [("en", "s1")] * 5
        + [("en", "s2")] * 4
        + [("en", "s3")] * 3
        + [("en", "s4")] * 2
        + [("en", "s5")] * 1
        + [("fr", "s1")] * 2
    )
    out = {
        (r.lang, r.bucket): r
        for r in topk_others(
            spark.createDataFrame(rows, ["lang", "source"]),
            "lang",
            "source",
            k=3,
        ).collect()
    }
    assert out[("en", "s1")].n_rows == 5
    assert out[("en", "OTHER")].n_rows == 3  # s4 + s5
    assert out[("en", "OTHER")].n_keys == 2
    # fr has fewer than k keys: no OTHER bucket
    assert ("fr", "OTHER") not in out and out[("fr", "s1")].n_rows == 2
