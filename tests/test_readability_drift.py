"""Flesch readability (textstats.readability_scores) and entity drift
(q_entity_drift invariants)."""

import math

import pytest
from pyspark.sql import functions as F

from ddaugner_spark.operators.textstats import readability_scores

import __spark_entry__ as E


def _docs(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_readability_hand_value(spark):
    # "go the up the": 4 words, 2 sentences ('the' terminators),
    # syllables: go=1, the=1, up=1, the=1 -> 4
    # flesch = 206.835 - 1.015*(4/2) - 84.6*(4/4) = 120.205
    d = _docs(spark, [(1, "go the up the", "en", "s")])
    r = readability_scores(d).collect()[0]
    assert (r.n_words, r.n_sent, r.n_syll) == (4, 2, 4)
    assert r.flesch == pytest.approx(120.205)
    assert r.band == "easy"


def test_readability_vowel_runs_and_min_one(spark):
    # "str" has no vowels -> 1 syllable floor; "aeiou" is ONE run -> 1;
    # "banana" has 3 runs
    d = _docs(spark, [(1, "str aeiou banana", "en", "s")])
    r = readability_scores(d).collect()[0]
    assert r.n_syll == 5
    assert r.n_sent == 1  # no terminator -> floor 1


def test_readability_bands(spark):
    # long polysyllabic single sentence -> hard
    text = " ".join(["exaggeration"] * 30)
    d = _docs(spark, [(1, text, "en", "s")])
    r = readability_scores(d).collect()[0]
    assert r.band == "hard"


def test_entity_drift_invariants(spark, sf_dir):
    rows = E.q_entity_drift(spark, sf_dir).collect()
    assert rows
    ta = sum(r.a for r in rows)
    tb = sum(r.b for r in rows)
    for r in rows:
        expect = math.log((r.a + 0.5) / (ta - r.a + 0.5)) - math.log(
            (r.b + 0.5) / (tb - r.b + 0.5)
        )
        assert r.log_odds == pytest.approx(expect, abs=1e-5)
        assert r.rising_in_first_half == (r.log_odds > 0)
