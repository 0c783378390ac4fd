"""Pigeonhole-banded SimHash pair search.

Round-1 blocking used a fixed 8-bit prefix — both a recall bug (a
hamming-3 pair whose differing bits all fall in the prefix is missed)
and a scale bug (256 buckets max).  These tests plant exactly such
pairs and prove the 4-band scheme finds them, plus exhaustive recall
on random fingerprints.
"""

import random

import pytest

from ddaugner_spark.operators.dedup import simhash_pairs_from_fingerprints


def _pairs(spark, fps, max_hamming=3, bits=16):
    fp = spark.createDataFrame(
        list(enumerate(fps)), "doc_id long, fingerprint string"
    )
    return {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_pairs_from_fingerprints(fp, max_hamming, bits).collect()
    }


def test_prefix_differing_pair_is_found(spark):
    """Bits 0, 2, 5 differ — all inside the old 8-bit prefix block, so
    prefix blocking misses this hamming-3 pair; banding must find it."""
    a = "0000000000000000"
    b = "1010010000000000"
    assert _pairs(spark, [a, b]) == {(0, 1, 3)}


def test_pair_beyond_threshold_is_rejected(spark):
    a = "0000000000000000"
    b = "1111000000000000"  # hamming 4 > 3, though bands 2-4 agree
    assert _pairs(spark, [a, b]) == set()


def test_exhaustive_recall_random(spark):
    """Banding == brute force on 60 random 16-bit fingerprints."""
    rng = random.Random(42)
    fps = ["".join(rng.choice("01") for _ in range(16)) for _ in range(60)]
    got = _pairs(spark, fps)
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = sum(x != y for x, y in zip(fps[i], fps[j]))
            if h <= 3:
                want.add((i, j, h))
    assert got == want


@pytest.mark.parametrize("bits,max_h", [(16, 3), (16, 1), (12, 2), (64, 3)])
def test_banding_lossless_parametrized(spark, bits, max_h):
    rng = random.Random(bits * 10 + max_h)
    base = "".join(rng.choice("01") for _ in range(bits))
    fps = [base]
    # neighbors at every distance 0..max_h with adversarial bit placement
    for d in range(1, max_h + 1):
        for offset in range(0, bits - d + 1, max(1, bits // 4)):
            f = list(base)
            for k in range(d):
                f[(offset + k) % bits] = "1" if f[(offset + k) % bits] == "0" else "0"
            fps.append("".join(f))
    got = _pairs(spark, fps, max_h, bits)
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = sum(x != y for x, y in zip(fps[i], fps[j]))
            if h <= max_h:
                want.add((i, j, h))
    assert got == want


def test_default_64bit_fingerprints_and_recall(spark):
    """Scale-safe defaults: 64-bit fingerprints (4 x 16-bit band keys),
    extended keyed-hash digits beyond position 32, and lossless banding
    for a planted near-dup under the DEFAULT parameters."""
    from ddaugner_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_duplicates,
        with_dup_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon w{i} zeta eta theta iota kappa") for i in range(8)],
        "doc_id long, text string",
    )
    fp = simhash_fingerprints(docs)  # default bits
    rows = fp.collect()
    assert all(len(r["fingerprint"]) == 64 for r in rows)
    assert len({r["fingerprint"] for r in rows}) > 1  # upper bits vary
    # an exact duplicate (hamming 0) must surface under the defaults
    # end-to-end (64-bit fingerprints through 4x16-bit banded search)
    pairs = simhash_near_duplicates(with_dup_corpus(
        spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
            "doc_id long, text string",
        )
    ))
    got = {(r["a"], r["b"], r["hamming"]) for r in pairs.collect()}
    assert (0, 1000000, 0) in got
