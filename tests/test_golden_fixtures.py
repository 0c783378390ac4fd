"""Golden parity against the reference's held-out NER fixtures
(BASELINE.json: "held-out NER fixtures (CoNLL-style tag spans) repurposed
as golden mention/triple sets").

The tag-only ``.conll.fixed`` files under /root/reference/ner/ are decoded
two ways: by the distributed corpus-level run-id operator
(sources.conll.spans_from_tag_table) and by the per-sentence pure kernel
(kernels.entities_from_bio_tags) — they must produce identical span sets,
and P/R vs the golden set must be exactly 1.0 through the scoring
operator."""

import glob

import pyspark.sql.functions as F
import pytest

from ddaugner_spark.kernels import entities_from_bio_tags
from ddaugner_spark.sources.conll import (
    read_conll,
    read_tag_only,
    spans_from_tag_table,
)

BOOKS = sorted(glob.glob("/root/reference/ner/new/*.conll.fixed"))[:5]


@pytest.mark.skipif(not BOOKS, reason="reference fixtures not present")
def test_spans_match_kernel_on_reference_fixtures(spark):
    tag_rows = read_tag_only(spark, BOOKS)
    got = spans_from_tag_table(tag_rows).collect()
    got_by_book = {}
    for r in got:
        got_by_book.setdefault(r["book"], set()).add(
            (r["start_idx"], r["end_idx"], r["tag"])
        )

    for path in BOOKS:
        book = path.split("/")[-1].replace(".conll.fixed", "")
        with open(path) as fh:
            tags = [line.strip() for line in fh.read().strip().split("\n")]
        toks = ["t"] * len(tags)
        expect = {
            (e.start_idx, e.end_idx, e.tag)
            for e in entities_from_bio_tags(toks, tags)
        }
        assert got_by_book.get(book, set()) == expect, book


@pytest.mark.skipif(not BOOKS, reason="reference fixtures not present")
def test_golden_self_score_is_one(spark):
    from ddaugner_spark.operators import scoring

    spans = spans_from_tag_table(read_tag_only(spark, BOOKS)).select(
        F.col("book").alias("doc_id"),
        F.lit(0).alias("sent_id"),
        "start_idx",
        "end_idx",
        "tag",
    )
    row = scoring.entity_set_score(spans, spans).first()
    assert row["precision"] == 1.0 and row["recall"] == 1.0


def test_conll_2col_reader(spark, tmp_path):
    p = tmp_path / "mini.txt"
    p.write_text("John B-PER\nSmith I-PER\nruns O\n\nParis B-LOC\n")
    rows = read_conll(spark, str(p)).orderBy("sent_id").collect()
    assert rows[0]["tokens"] == ["John", "Smith", "runs"]
    assert rows[0]["tags"] == ["B-PER", "I-PER", "O"]
    assert rows[1]["tokens"] == ["Paris"]


def test_conll_keep_only_classes(spark, tmp_path):
    p = tmp_path / "mini.txt"
    p.write_text("John B-PER\nParis B-LOC\n")
    df = read_conll(spark, str(p), keep_only_classes={"PER"})
    assert df.first()["tags"] == ["B-PER", "O"]


def test_conll_export_roundtrip(spark, tmp_path):
    """S6: export then re-read reproduces tokens and tags."""
    from ddaugner_spark.sources.conll import conll_export

    p = tmp_path / "src.txt"
    p.write_text("John B-PER\nruns O\n\nParis B-LOC\nis O\nnice O\n")
    df = read_conll(spark, str(p))
    out = str(tmp_path / "exported")
    conll_export(df, out)
    back = read_conll(spark, out + "/*.txt")
    a = {(r["sent_id"], tuple(r["tokens"]), tuple(r["tags"])) for r in df.collect()}
    b = {(r["sent_id"], tuple(r["tokens"]), tuple(r["tags"])) for r in back.collect()}
    assert {x[1:] for x in a} == {x[1:] for x in b}
