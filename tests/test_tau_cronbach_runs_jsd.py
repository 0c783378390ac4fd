"""Kendall τ-b, Cronbach's α, Wald–Wolfowitz runs test
(operators/stats.py), per-group Jensen–Shannon drift
(operators/textstats.py jsd_by_group).

The sf gate replays each against its SQL twin; the discriminating
numerics are pinned here against brute-force pure-Python replays
(row-pair τ-b enumeration, textbook α, hand-counted runs, a full
two-distribution JSD including the absent-token tail).
"""

import math

import pytest

from ddaugner_spark.operators.stats import (
    cronbach_alpha,
    kendall_tau_b,
    runs_test,
)
from ddaugner_spark.operators.textstats import jsd_by_group


# --------------------------------------------------------- Kendall τ-b

def _brute_tau_b(xs, ys):
    n = len(xs)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx * dy > 0:
                C += 1
            else:
                D += 1
    n0 = n * (n - 1) // 2
    denom = math.sqrt((n0 - (tx)) * (n0 - (ty)))
    return C, D, (C - D) / denom if denom else None


def test_tau_b_matches_row_pair_enumeration(spark):
    xs = [1, 2, 3, 4, 5, 2, 3, 1]
    ys = [3, 1, 4, 2, 5, 1, 4, 3]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    got = kendall_tau_b(df, "x", "y").collect()[0]
    # brute force counts ties per PAIR; the operator reports binomial
    # margin ties (pairs tied on x / on y, joint ties in both)
    C, D, tau = _brute_tau_b(xs, ys)
    assert (got.concordant, got.discordant) == (C, D)
    assert got.n == len(xs) and got.n_pairs == len(xs) * (len(xs) - 1) // 2
    # margin-tie identity: ties_x counts pairs equal on x (incl. joint)
    tx = sum(
        1
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
        if xs[i] == xs[j]
    )
    ty = sum(
        1
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
        if ys[i] == ys[j]
    )
    assert (got.ties_x, got.ties_y) == (tx, ty)
    want = (C - D) / math.sqrt(
        (got.n_pairs - tx) * (got.n_pairs - ty)
    )
    assert got.tau_b == pytest.approx(want, abs=1e-6)


def test_tau_b_perfect_and_constant(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(6)], ["x", "y"])
    assert kendall_tau_b(df, "x", "y").collect()[0].tau_b == 1.0
    const = spark.createDataFrame([(i, 7) for i in range(6)], ["x", "y"])
    assert const.transform(
        lambda d: kendall_tau_b(d, "x", "y")
    ).collect()[0].tau_b is None


# --------------------------------------------------------- Cronbach α

def test_cronbach_matches_textbook_formula(spark):
    rows = [
        (1, 1, 1, 0),
        (1, 1, 0, 0),
        (1, 0, 0, 0),
        (1, 1, 1, 1),
        (0, 0, 0, 0),
        (1, 1, 1, 1),
        (0, 1, 0, 1),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    got = cronbach_alpha(df, ["a", "b", "c", "d"]).collect()[0]
    n, k = len(rows), 4
    items_num = 0
    for i in range(k):
        s = sum(r[i] for r in rows)
        q = sum(r[i] * r[i] for r in rows)
        items_num += n * q - s * s
    sx = sum(sum(r) for r in rows)
    qx = sum(sum(r) ** 2 for r in rows)
    total_num = n * qx - sx * sx
    assert (got.items_var_num, got.total_var_num) == (items_num, total_num)
    want = k / (k - 1) * (1 - items_num / total_num)
    assert got.alpha == pytest.approx(want, abs=1e-6)
    # cross-check against the classic sample-variance form
    import statistics

    var_items = sum(
        statistics.variance([r[i] for r in rows]) for i in range(k)
    )
    var_total = statistics.variance([sum(r) for r in rows])
    assert got.alpha == pytest.approx(
        k / (k - 1) * (1 - var_items / var_total), abs=1e-6
    )


def test_cronbach_degenerate_null(spark):
    same = spark.createDataFrame([(1, 1), (1, 1)], ["a", "b"])
    assert cronbach_alpha(same, ["a", "b"]).collect()[0].alpha is None
    with pytest.raises(ValueError):
        cronbach_alpha(same, ["a"])


# ----------------------------------------------------------- runs test

def test_runs_hand_counted(spark):
    # T T F T F F F T T F  -> runs: TT|F|T|FFF|TT|F = 6
    flags = [True, True, False, True, False, False, False, True, True, False]
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(flags)], ["o", "f"]
    )
    got = runs_test(df, "o", "f").collect()[0]
    n1, n2, n = 5, 5, 10
    assert (got.n, got.n_true, got.n_false, got.runs) == (n, n1, n2, 6)
    p2 = 2.0 * n1 * n2
    mu = p2 / n + 1.0
    var = p2 * (p2 - n) / (n * n * (n - 1))
    assert got.z == pytest.approx((6 - mu) / math.sqrt(var), abs=1e-6)


def test_runs_one_sided_null(spark):
    df = spark.createDataFrame([(i, True) for i in range(5)], ["o", "f"])
    got = runs_test(df, "o", "f").collect()[0]
    assert got.runs == 1 and got.z is None


# ------------------------------------------------------------- JSD

def _brute_jsd(p_counts, corpus_counts):
    np_, nq = sum(p_counts.values()), sum(corpus_counts.values())
    jsd = 0.0
    for w in corpus_counts:
        p = p_counts.get(w, 0) / np_
        q = corpus_counts[w] / nq
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    return jsd


def test_jsd_matches_full_two_distribution_replay(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b c", "s1"),
            (2, "a b b d", "s1"),
            (3, "x x y a", "s2"),
            (4, "x y y z", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    rows = {r["source"]: r for r in jsd_by_group(docs, "source").collect()}
    corpus: dict = {}
    groups: dict = {"s1": {}, "s2": {}}
    for _, text, src in docs.collect():
        for w in text.split(" "):
            corpus[w] = corpus.get(w, 0) + 1
            groups[src][w] = groups[src].get(w, 0) + 1
    for src in ("s1", "s2"):
        want = _brute_jsd(groups[src], corpus)
        assert rows[src].jsd == pytest.approx(want, abs=1e-6)
        assert 0.0 <= rows[src].jsd <= math.log(2.0) + 1e-9
        assert rows[src].n_tokens == sum(groups[src].values())
        assert rows[src].vocab == len(groups[src])


def test_jsd_identical_distribution_is_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")],
        ["doc_id", "text", "source"],
    )
    for r in jsd_by_group(docs, "source").collect():
        # each source IS half the corpus with the same distribution
        assert r.jsd == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------------- Burrows Delta

def _delta_brute(rows, top_n=30):
    """Eager quantized replay of burrows_delta on (source, text)."""
    from collections import Counter, defaultdict

    cw = defaultdict(Counter)
    corpus = Counter()
    for src, text in rows:
        for w in (text.split(" ") if text else []):
            cw[src][w] += 1
            corpus[w] += 1
    top = [
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:top_n]
    ng = {s: sum(c.values()) for s, c in cw.items()}
    fq = {
        (s, w): round(1e9 * cw[s][w] / ng[s]) for s in cw for w in top
    }
    groups = sorted(cw)
    z = {}
    for w in top:
        vals = [fq[(s, w)] for s in groups]
        S, sf, qf = len(vals), sum(vals), sum(v * v for v in vals)
        var = (S * qf - sf * sf) / (S * (S - 1))
        for s in groups:
            z[(s, w)] = (
                (fq[(s, w)] - sf / S) / var**0.5 if var > 0 else 0.0
            )
    out = {}
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            sq = sum(round(1e6 * abs(z[(a, w)] - z[(b, w)])) for w in top)
            out[(a, b)] = round(sq / len(top) / 1e6, 6)
    return out


def test_burrows_delta_matches_replay_and_separates_styles(spark):
    from ddaugner_spark.operators.textstats import burrows_delta

    # s1/s2 share function-word style; s3 writes differently
    rows = [
        ("s1", "the cat sat on the mat and the dog sat too"),
        ("s1", "the bird and the fish sat on the log"),
        ("s2", "the fox sat on the box and the hen sat still"),
        ("s3", "quantum flux meson decay entropy gradient vector"),
        ("s3", "meson entropy flux vector decay quantum gradient"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r.delta
        for r in burrows_delta(docs, "source", top_n=10).collect()
    }
    want = _delta_brute(rows, top_n=10)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    # style separation: the two the-style sources are closer to each
    # other than either is to the jargon source
    assert got[("s1", "s2")] < got[("s1", "s3")]
    assert got[("s1", "s2")] < got[("s2", "s3")]


# ---------------------------------------------------- Fightin' Words

def test_fightin_words_direction_and_replay(spark):
    import math

    from ddaugner_spark.operators.textstats import fightin_words

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha shared shared", "en"),
            (2, "alpha shared shared shared", "en"),
            (3, "beta beta beta shared shared", "zh"),
            (4, "beta shared shared shared", "zh"),
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        r.token: r
        for r in fightin_words(
            docs, "source", "en", "zh", alpha0=10.0, min_count=2
        ).collect()
    }
    # direction: 'alpha' is en-marked (z > 0), 'beta' zh-marked (z < 0),
    # 'shared' near zero; symmetric corpus -> antisymmetric scores
    assert got["alpha"].z > 0 > got["beta"].z
    assert abs(got["shared"].z) < abs(got["alpha"].z)
    assert got["alpha"].z == pytest.approx(-got["beta"].z, abs=1e-6)

    # eager replay for one token
    ya, yb, na, nb, nn = 4, 0, 9, 9, 18
    aw = 10.0 * (ya + yb) / nn
    delta = math.log((ya + aw) / (na + 10.0 - ya - aw)) - math.log(
        (yb + aw) / (nb + 10.0 - yb - aw)
    )
    z = delta / math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
    assert got["alpha"].delta == pytest.approx(delta, abs=1e-6)
    assert got["alpha"].z == pytest.approx(z, abs=1e-6)


# ------------------------------------------------------- Holm / SRM

def test_holm_stops_at_first_failure(spark, sf_dir):
    """Holm rejects a PREFIX of the p-sorted tokens (no rejections
    after the first failure) and is never more permissive than BH on
    the same p table."""
    from ddaugner_spark.operators.textstats import (
        chi2_bh_select,
        chi2_holm_select,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    holm = sorted(chi2_holm_select(docs).collect(), key=lambda r: r.rank)
    bh = {r.tok: r.rejected for r in chi2_bh_select(docs).collect()}
    flags = [r.rejected for r in holm]
    # prefix property: once False, always False
    if False in flags:
        first_false = flags.index(False)
        assert not any(flags[first_false:])
    # FWER <= FDR permissiveness: holm-rejected is a subset of BH's
    for r in holm:
        if r.rejected:
            assert bh[r.tok]


def test_srm_balanced_and_broken(spark):
    import datetime

    from ddaugner_spark.operators.events import srm_check

    def ev(users):
        return spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1), u, "view", 1.0, "{}")
                for i, u in enumerate(users)
            ],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )

    ok = srm_check(ev(list(range(100)))).collect()[0]
    assert (ok.n, ok.n_a, ok.n_b) == (100, 50, 50)
    assert ok.z == 0.0 and not ok.srm_flag
    broken = srm_check(ev([2 * i for i in range(100)])).collect()[0]
    assert broken.n_b == 0 and broken.srm_flag
    assert broken.z == pytest.approx(100 / 10, abs=1e-6)
