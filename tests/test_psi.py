"""PSI distribution drift (q_psi_drift invariants)."""

import math

import __spark_entry__ as E


def test_psi_bucket_universe_and_terms(spark, sf_dir):
    rows = {r.bucket: r for r in E.q_psi_drift(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(10))  # generated universe, empties too
    na = sum(r.ca for r in rows.values())
    nb = sum(r.cb for r in rows.values())
    for r in rows.values():
        pa = (r.ca + 0.5) / (na + 5.0)
        pb = (r.cb + 0.5) / (nb + 5.0)
        expect = (pa - pb) * math.log(pa / pb)
        assert abs(r.psi_term - expect) < 1e-5
    # PSI terms are individually non-negative: (pa-pb) and ln(pa/pb)
    # always share a sign
    assert all(r.psi_term >= 0 for r in rows.values())
