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
