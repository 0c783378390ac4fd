"""Reference-shaped single-node baseline.

The reference (ddaugNER) publishes no throughput numbers (SURVEY.md §6)
and its execution model is eager single-process Python over sentence
lists.  This script measures exactly that shape — a single-threaded
Python loop running the same dictionary mention detection + BIO decoding
+ SVO triple rule over the same corpus the Spark bench uses — so
BENCH/BASELINE.md can compare the engine against a faithful single-node
stand-in on identical input and semantics (the loop reuses the pure
kernels that are differentially tested against the Spark operators).

Usage: python tools/reference_baseline.py [sf_dir] [amplify]
Prints one JSON line {docs, tokens, mentions, triples, sec, *_per_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ddaugner_spark import config
from ddaugner_spark.kernels import entities_from_bio_tags
from ddaugner_spark.operators.tagging import DictTaggerModel


def measure(sf_dir: str, amplify: int) -> dict:
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ] * amplify

    model = DictTaggerModel()
    pred_words = set(config.PRED_WORDS)
    term = config.SENT_TERM

    n_tokens = n_mentions = n_triples = 0
    t0 = time.time()
    for text in texts:
        toks = text.split(" ")
        n_tokens += len(toks)
        tags = model.tag_tokens(toks)
        sent_ids, c = [], 0
        for t in toks:
            sent_ids.append(c)
            if t == term:
                c += 1
        ents = entities_from_bio_tags(toks, tags)
        n_mentions += len(ents)
        pred_pos = [i for i, t in enumerate(toks) if t in pred_words]
        for s in ents:
            for o in ents:
                if not (
                    s.end_idx + 1 < o.start_idx <= s.end_idx + 1 + config.TRIPLE_MAX_GAP
                ):
                    continue
                if sent_ids[s.start_idx] != sent_ids[o.start_idx]:
                    continue
                if any(s.end_idx < p < o.start_idx for p in pred_pos):
                    n_triples += 1
    wall = time.time() - t0

    return {
        "impl": "single_process_python_reference_shape",
        "docs": len(texts),
        "tokens": n_tokens,
        "mentions": n_mentions,
        "triples": n_triples,
        "sec": round(wall, 3),
        "docs_per_sec": round(len(texts) / wall, 1),
        "mentions_per_sec": round(n_mentions / wall, 1),
        "tokens_per_sec": round(n_tokens / wall, 1),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(json.dumps(measure(sf_dir, amplify)))


if __name__ == "__main__":
    main()
