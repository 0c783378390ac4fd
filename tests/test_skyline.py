"""Skyline / Pareto front (operators/skyline.py): hand fixtures, the
tie/duplicate contract (equal rows never dominate each other), the
constant-dimension edge, and a brute-force differential on seeded
random points in 2 and 3 dims — pinning that the grid pruning is
purely physical."""

import random

from ddaugner_spark.operators.skyline import skyline


def _pts(spark, pts):
    cols = "x double, y double" if len(pts[0]) == 2 else "x double, y double, z double"
    return spark.createDataFrame([tuple(float(v) for v in p) for p in pts], cols)


def _sky_py(pts):
    out = []
    for r in pts:
        dominated = any(
            all(s[i] >= r[i] for i in range(len(r)))
            and any(s[i] > r[i] for i in range(len(r)))
            for s in pts
        )
        if not dominated:
            out.append(tuple(float(v) for v in r))
    return sorted(out)


def test_hand_fixture(spark):
    got = sorted(
        (r["x"], r["y"])
        for r in skyline(_pts(spark, [(1, 1), (2, 2), (1, 3), (3, 1)]),
                         ["x", "y"]).collect()
    )
    assert got == [(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)]


def test_duplicates_both_kept(spark):
    got = sorted(
        (r["x"], r["y"])
        for r in skyline(_pts(spark, [(2, 2), (2, 2), (1, 1)]),
                         ["x", "y"]).collect()
    )
    assert got == [(2.0, 2.0), (2.0, 2.0)]


def test_constant_dimension(spark):
    got = sorted(
        (r["x"], r["y"])
        for r in skyline(_pts(spark, [(5, 1), (5, 3), (5, 3), (5, 2)]),
                         ["x", "y"]).collect()
    )
    assert got == [(5.0, 3.0), (5.0, 3.0)]


def test_differential_2d(spark):
    rng = random.Random(11)
    pts = [(rng.randint(0, 100), rng.randint(0, 100)) for _ in range(300)]
    got = sorted(
        (r["x"], r["y"]) for r in skyline(_pts(spark, pts), ["x", "y"]).collect()
    )
    assert got == _sky_py(pts)


def test_differential_3d(spark):
    rng = random.Random(12)
    pts = [(rng.randint(0, 20), rng.randint(0, 20), rng.randint(0, 20))
           for _ in range(250)]
    got = sorted(
        (r["x"], r["y"], r["z"])
        for r in skyline(_pts(spark, pts), ["x", "y", "z"], grid=8).collect()
    )
    assert got == _sky_py(pts)
