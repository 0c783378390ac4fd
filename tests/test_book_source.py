"""Book source (S2 complete): sentence re-split on ``. ? ! ''`` and
nltk token normalization, differential against a direct port of the
reference loader (/root/reference/ddaugner/datas/datas.py:295-345) on
the reference's own book files.
"""

import glob
import os

import pytest

from ddaugner_spark.sources.conll import BOOK_TOKEN_FIXES, read_book_sentences

REF_OLD = "/root/reference/ner/old"
BOOKS = sorted(glob.glob(f"{REF_OLD}/*.conll"))[:3]

pytestmark = pytest.mark.skipif(not BOOKS, reason="reference books absent")


def _load_py(path, fix=True):
    """Direct port of BookDataset.__init__ (datas.py:295-345)."""
    sents, cur_t, cur_g = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            parts = line.split(" ")
            if len(parts) < 2:
                continue
            token, tag = parts[0], parts[1]
            cur_t.append(token)
            cur_g.append(tag)
            if token in [".", "?", "!"] or (fix and token == "''"):
                sents.append((cur_t, cur_g))
                cur_t, cur_g = [], []
    if cur_t:
        sents.append((cur_t, cur_g))
    if fix:
        for toks, _tags in sents:
            for i, t in enumerate(toks):
                if t in BOOK_TOKEN_FIXES:
                    toks[i] = BOOK_TOKEN_FIXES[t]
    return sents


@pytest.mark.parametrize("path", BOOKS)
def test_book_sentences_match_reference_port(spark, path):
    book = os.path.splitext(os.path.basename(path))[0]
    want = _load_py(path)
    got = {
        r["sent_id"]: (list(r["tokens"]), list(r["tags"]))
        for r in read_book_sentences(spark, path).filter(f"book = '{book}'").collect()
    }
    assert len(got) == len(want)
    for sid, (toks, tags) in enumerate(want):
        assert got[sid] == (toks, tags), (book, sid)


def test_normalization_map_is_reference_exact():
    assert BOOK_TOKEN_FIXES == {
        "``": '"', "''": '"', "`": "'",
        "-LRB-": "(", "-RRB-": ")", "-LSB-": "[", "-RSB-": "]",
    }
