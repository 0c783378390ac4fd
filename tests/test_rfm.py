"""RFM segmentation (q_rfm invariants against the events table)."""

import __spark_entry__ as E


def test_rfm_invariants(spark, sf_dir):
    rows = E.q_rfm(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.r_days >= 0 and r.f >= 1 and r.m_cents > 0
    # ntile balance: bucket sizes differ by at most 1
    from collections import Counter
    for key in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, key) for r in rows).values()
        assert max(sizes) - min(sizes) <= 1
    # monotonicity: the best monetary quintile holds the largest spenders
    best = [r.m_cents for r in rows if r.m_score == 5]
    rest = [r.m_cents for r in rows if r.m_score < 5]
    if best and rest:
        assert min(best) >= max(rest)
