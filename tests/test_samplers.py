"""Compositional name samplers (R4): the Catalyst column expression and
the plain-Python twin must produce identical names for identical seeds,
the Elder-Scrolls form ladder must hit all 10 reference forms
(the_elder_scrolls.py:28-63), and the French sampler all 5 shapes
(french_names.py:19-33).
"""

import pyspark.sql.functions as F

from ddaugner_spark.functions import (
    elder_scrolls_name,
    elder_scrolls_name_py,
    french_name,
    french_name_py,
)
from ddaugner_spark.functions.samplers import ES_FORMS


def test_column_expr_equals_python_twin(spark):
    seeds = list(range(300))
    df = spark.createDataFrame([(s,) for s in seeds], "seed long")
    got = {
        r["seed"]: (r["es"], r["fr"])
        for r in df.select(
            "seed",
            elder_scrolls_name(F.col("seed")).alias("es"),
            french_name(F.col("seed")).alias("fr"),
        ).collect()
    }
    for s in seeds:
        assert got[s] == (elder_scrolls_name_py(s), french_name_py(s)), s


def test_elder_scrolls_ladder_covers_all_forms():
    lengths = set()
    forms_hit = set()
    for s in range(2000):
        r = (s * 2654435761) % 100
        for thr, form in ES_FORMS:
            if r < thr:
                forms_hit.add(form)
                break
        lengths.add(len(elder_scrolls_name_py(s).split(" ")))
    assert len(forms_hit) == 10
    assert lengths == {1, 2, 3, 4}


def test_french_shapes():
    shapes = {len(french_name_py(s).split(" ")) for s in range(200)}
    assert shapes == {1, 2, 3}


def test_deterministic():
    assert elder_scrolls_name_py(1234) == elder_scrolls_name_py(1234)
    assert french_name_py(77) == french_name_py(77)


def test_holdout_split_deterministic_and_near_80(spark):
    from ddaugner_spark.operators.sampling import holdout_split
    import pyspark.sql.functions as F

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"]: r["s"] for r in df.select("doc_id", holdout_split().alias("s")).collect()}
    s2 = {r["doc_id"]: r["s"] for r in df.repartition(7).select("doc_id", holdout_split().alias("s")).collect()}
    assert s1 == s2  # identity-derived: partitioning-invariant
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.75 < frac < 0.85


def test_horvitz_thompson_exact_replay_and_unbiasedness_shape(spark):
    """hashlib replay of the sampler membership + the estimator
    formulas; a rate-1000 stratum is a census: estimate == truth,
    variance 0, rel_err 0."""
    import hashlib

    from ddaugner_spark.operators import sampling

    rows = [
        (i, " ".join(["w"] * (5 + i % 7)), "en", f"src{i % 2}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    rates = {"src0": 1000, "src1": 400}
    got = {
        r["stratum"]: r
        for r in sampling.horvitz_thompson(docs, rates).collect()
    }

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 1000

    for s, mille in rates.items():
        xs = [5 + i % 7 for i, _, _, src in rows if src == s]
        sampled = [
            5 + i % 7
            for i, _, _, src in rows
            if src == s and bucket(i) < mille
        ]
        pi = mille / 1000.0
        r = got[s]
        assert r["n_sampled"] == len(sampled)
        assert r["true_tokens"] == sum(xs)
        assert r["est_tokens"] == round(sum(sampled) / pi, 6)
        assert r["var_est"] == round(
            sum(x * x for x in sampled) * (1.0 - pi) / (pi * pi), 6
        )
    census = got["src0"]
    assert census["est_tokens"] == float(census["true_tokens"])
    assert census["var_est"] == 0.0 and census["rel_err"] == 0.0
