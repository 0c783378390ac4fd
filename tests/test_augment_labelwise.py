"""R1/R3 single-entity replacement — property test: per sentence the
corpus operator must equal the pure kernel (replace_entity_occurrences,
itself pinned to ddaugner/datas/aug.py:40-74 by test_bio_kernels) run on
the same deterministic pick.
"""

import pyspark.sql.functions as F

from ddaugner_spark import config
from ddaugner_spark.kernels import replace_entity_occurrences
from ddaugner_spark.operators import augment
from ddaugner_spark.operators.tagging import DictTaggerModel


def _sentences(text):
    """Split into (sent_id, tokens) by the terminator, which stays with
    the preceding sentence (datas.py:303-313)."""
    out, cur, sid = [], [], 0
    for t in text.split(" "):
        cur.append(t)
        if t == config.SENT_TERM:
            out.append((sid, cur))
            cur, sid = [], sid + 1
    if cur:
        out.append((sid, cur))
    return out


def test_labelwise_equals_kernel(spark, docs):
    sample = docs.limit(60)
    got = {
        (r["doc_id"], r["sent_id"]): r
        for r in augment.augment_labelwise(sample).collect()
    }

    model = DictTaggerModel()
    pool = config.INJECT_NAMES
    want = {}
    for row in sample.collect():
        doc_id = row["doc_id"]
        for sent_id, toks in _sentences(row["text"]):
            tags = model.tag_tokens(toks)
            starts = [i for i, t in enumerate(tags) if t == "B-PER"]
            if not starts:
                continue
            pick = starts[(doc_id * 7 + sent_id * 31) % len(starts)]
            old = toks[pick]
            new = pool[(doc_id * 7 + sent_id * 31) % len(pool)]
            new_toks, _ = replace_entity_occurrences(toks, tags, [old], "PER", [new])
            n_rep = sum(
                1
                for i, t in enumerate(tags)
                if t == "B-PER" and toks[i] == old
            )
            want[(doc_id, sent_id)] = (old, new, n_rep, " ".join(new_toks))

    assert set(got) == set(want)
    for key, (old, new, n_rep, text) in want.items():
        g = got[key]
        assert (
            g["old_surface"],
            g["new_surface"],
            g["n_replaced"],
            g["new_text"],
        ) == (old, new, n_rep, text), key
