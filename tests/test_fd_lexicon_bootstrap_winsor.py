"""Round-5 session-10 operators: FD discovery, lexicon screening,
deterministic bootstrap CI, winsorization.

Each test pins the closed-form value on a micro-fixture small enough to
verify by hand; engine↔oracle parity at corpus scale is pinned by
tools/parity_check.py (q_fd_profile, q_lexicon_screen, q_bootstrap_ci,
q_winsorize).
"""

from ddaugner_spark.operators.stats import (
    bootstrap_mean_ci,
    fd_profile,
    winsorize,
)
from ddaugner_spark.operators.textstats import lexicon_screen


def test_fd_profile_exact_and_approx(spark):
    # a -> b exact (every a maps to one b); b -> a approximate:
    # b=1 determines a in {1, 2} (max count 2 of 3), b=2 -> a=3 (1 of 1)
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1), (3, 2)], ["a", "b"]
    )
    out = {
        (r.determinant, r.dependent): r
        for r in fd_profile(df, [("a", "b"), ("b", "a")]).collect()
    }
    ab = out[("a", "b")]
    assert (ab.n_rows, ab.ndv_det, ab.ndv_pair) == (4, 3, 3)
    assert ab.exact_fd and ab.g3_conf == 1.0
    ba = out[("b", "a")]
    assert (ba.n_rows, ba.ndv_det, ba.ndv_pair) == (4, 2, 3)
    # g3 repair keeps max-per-a counts: 2 (b=1, a=1) + 1 (b=2) of 4
    assert not ba.exact_fd and ba.g3_conf == 0.75


def test_fd_profile_null_is_a_value(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, "x")], "a int, b string"
    )
    r = fd_profile(df, [("a", "b")]).collect()[0]
    assert r.exact_fd and r.ndv_pair == 2


def test_lexicon_screen_scores(spark):
    docs = spark.createDataFrame(
        [
            (0, "Fast fast slow x"),   # +1000+1000-1000 = +1.0, 3 hits
            (1, "slow"),               # -1.0, neg
            (2, "x y"),                # no hits, neutral
            (3, None),                 # empty doc: 0 tokens
        ],
        ["doc_id", "text"],
    )
    lex = {"fast": 1000, "slow": -1000}
    out = {r.doc_id: r for r in lexicon_screen(docs, lex).collect()}
    assert (out[0].n_tokens, out[0].n_hits, out[0].score, out[0].label) == (
        4, 3, 1.0, "pos",
    )
    assert (out[1].score, out[1].label) == (-1.0, "neg")
    assert (out[2].n_hits, out[2].label) == (0, "neutral")
    assert (out[3].n_tokens, out[3].score, out[3].label) == (
        0, 0.0, "neutral",
    )


def test_bootstrap_ci_deterministic_and_ordered(spark):
    df = spark.createDataFrame(
        [(i, float(i % 10) + 0.5) for i in range(400)],
        ["event_id", "value"],
    )
    a = bootstrap_mean_ci(df, "event_id", "value", n_boot=64).collect()[0]
    b = bootstrap_mean_ci(df, "event_id", "value", n_boot=64).collect()[0]
    assert a == b  # pure function of row identity
    assert a.n_rows == 400 and a.n_boot == 64
    assert a.mean == 5.0
    assert a.ci_lo <= a.mean <= a.ci_hi
    # Poisson-bootstrap CI of a 400-row mean is tight around 5
    assert 4.0 < a.ci_lo and a.ci_hi < 6.0


def test_bootstrap_ci_survives_repartition(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["event_id", "value"]
    )
    a = bootstrap_mean_ci(df, "event_id", "value").collect()[0]
    b = bootstrap_mean_ci(
        df.repartition(7), "event_id", "value"
    ).collect()[0]
    assert a == b


def test_winsorize_clamps_tails(spark):
    # group g: values 1..19 and one 1000.0 outlier; n=20
    # k_lo = ceil(.05*20) = 1 -> lo_c = min value; k_hi = ceil(.95*20)=19
    # -> hi_c = 19.0 in cents = 1900; the outlier clamps to 19.0
    rows = [("g", float(v)) for v in range(1, 20)] + [("g", 1000.0)]
    out = winsorize(
        spark.createDataFrame(rows, ["event_type", "value"]),
        "event_type",
        "value",
    ).collect()
    r = out[0]
    assert (r.n, r.lo_c, r.hi_c) == (20, 100, 1900)
    assert r.mean_raw == round((sum(range(1, 20)) + 1000) / 20, 6)
    assert r.mean_winsor == round((sum(range(1, 20)) + 19) / 20, 6)
    assert r.n_clipped == 1


def test_winsorize_constant_group_noop(spark):
    rows = [("g", 5.0)] * 4
    r = winsorize(
        spark.createDataFrame(rows, ["event_type", "value"]),
        "event_type",
        "value",
    ).collect()[0]
    assert r.mean_raw == r.mean_winsor == 5.0 and r.n_clipped == 0
