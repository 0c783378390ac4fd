"""KG completion eval (TransE protocol) — engine output pinned against
an eager Python reference with the same md5-derived integer vectors."""

import hashlib

from ddaugner_spark.operators import triples as triples_mod
from ddaugner_spark.operators.kgquery import kg_completion_eval


def _h4(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _vec(x: str, dim=16, mod=17):
    return [_h4(f"{x}#{i}") % mod - mod // 2 for i in range(dim)]


def _py_eval(facts_all, sample_mod=10):
    ents = sorted({h for h, _, _ in facts_all} | {t for _, _, t in facts_all})
    facts = [
        (h, r, t)
        for h, r, t in sorted(set(facts_all))
        if _h4(f"{h}#{r}#{t}") % sample_mod == 0
    ]
    vres = {}

    def v(x):
        if x not in vres:
            vres[x] = _vec(x)
        return vres[x]

    rr_sum = h1 = h3 = h10 = 0
    for h, r, t in facts:
        scored = sorted(
            (sum(abs(a + b - c) for a, b, c in zip(v(h), v(r), v(e))), e)
            for e in ents
        )
        rnk = 1 + [e for _, e in scored].index(t)
        rr_sum += round(1000000.0 / rnk)
        h1 += rnk <= 1
        h3 += rnk <= 3
        h10 += rnk <= 10
    n = len(facts)
    return {
        "n_facts": n,
        "n_entities": len(ents),
        "mrr": round(rr_sum / n / 1000000.0, 6),
        "hits1": round(h1 / n, 6),
        "hits3": round(h3 / n, 6),
        "hits10": round(h10 / n, 6),
    }


def test_kg_completion_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tri = triples_mod.triples_df(docs)
    row = kg_completion_eval(tri).collect()[0].asDict()
    facts_all = [
        (r["subj"], r["pred"], r["obj"])
        for r in tri.select("subj", "pred", "obj").collect()
    ]
    want = _py_eval(facts_all)
    assert row == want
    assert row["n_facts"] > 0
    assert 0.0 < row["mrr"] <= 1.0
    assert row["hits1"] <= row["hits3"] <= row["hits10"]
