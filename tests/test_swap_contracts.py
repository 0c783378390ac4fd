"""Swap-readiness contracts (VERDICT r5 #5/#8): the two sandbox-forced
stubs — the BERT forward and the media codec kernels — and the Iceberg
sink branch each get their interface pinned, so dropping the real
implementation in is a one-function change with a test that would catch
an interface drift, not a debugging session.

* ``WordpieceTaggerModel.forward(pieces, word_ids, token_tags)`` must
  return per-wordpiece logits shaped ``[len(pieces)][n_labels]`` of
  floats — exactly the (squeezed) logits tensor a HuggingFace
  ``AutoModelForTokenClassification`` forward yields for one encoded
  sentence (reference predict.py:58-75), so the swap is
  ``logits = model(**enc).logits[0].tolist()``.
* the codec kernels are pandas-batch functions ``pdf -> pdf`` whose
  output columns match the declared ``mapInPandas`` schemas
  (DECODE_SCHEMA / RESIZE_SCHEMA); a real PIL/ffmpeg decode slots into
  the same signature.
* ``materialize()``'s sink decision is pure (``select_branch``) and
  pinned BOTH ways, since the sandbox can only execute the parquet arm.
"""

import math

import pandas as pd

from ddaugner_spark.operators import multimodal
from ddaugner_spark.operators.tagging import (
    ID2LABEL,
    WordpieceTaggerModel,
    featurize_with_context,
)
from ddaugner_spark.plans.materialize import select_branch


def test_forward_contract_shape_and_dtype():
    """forward() output == HF token-classification logits shape:
    one row per wordpiece (INCLUDING special tokens), n_labels floats
    per row — the alignment layer depends on exactly this."""
    m = WordpieceTaggerModel(max_length=512)
    sent = ["hash", "brown", "visited", "boston", "."]
    tags = m.dict_model.tag_tokens(sent)
    pieces, word_ids, mask = featurize_with_context([], sent, [], max_length=512)
    logits = m.forward(pieces, word_ids, tags)
    assert len(logits) == len(pieces) == len(word_ids)
    n_labels = len(ID2LABEL)
    for row in logits:
        assert len(row) == n_labels
        assert all(isinstance(x, float) and not math.isnan(x) for x in row)


def test_forward_contract_consumed_only_via_argmax():
    """The post-processing consumes logits only through per-row argmax,
    so any real model emitting the same shape (un-normalized scores,
    logits, or probabilities) is drop-in: scaling every row must not
    change the tagged output."""
    m = WordpieceTaggerModel(max_length=512)

    class Scaled(WordpieceTaggerModel):
        def forward(self, pieces, word_ids, token_tags):
            base = WordpieceTaggerModel.forward(self, pieces, word_ids, token_tags)
            return [[7.25 * x - 3.0 for x in row] for row in base]

    s = Scaled(max_length=512)
    sent = ["hash", "brown", "visited", "boston", "."]
    assert m.tag_sentence(sent) == s.tag_sentence(sent)


def test_decode_kernel_batch_signature():
    """_fake_decode_batch: pandas (url, html[binary]) -> pandas frame
    with exactly DECODE_SCHEMA's columns; NULL payload -> NULL fields.
    A real codec must satisfy the same pdf->pdf contract."""
    pdf = pd.DataFrame(
        {"url": ["u1", "u2"], "html": [b"\x01\x02\x03\x04abc", None]}
    )
    out = multimodal._fake_decode_batch(pdf)
    assert list(out.columns) == [f.name for f in multimodal.DECODE_SCHEMA.fields]
    assert len(out) == len(pdf)
    assert out["n_bytes"][0] == 7 and len(out["feature"][0]) == multimodal.FEATURE_DIM
    # pandas renders the numeric None as NaN; Arrow maps both to NULL
    assert pd.isna(out["n_bytes"][1]) and out["feature"][1] is None


def test_resize_schema_columns_match_kernel():
    assert [f.name for f in multimodal.RESIZE_SCHEMA.fields] == ["url", "feature"]


def test_iceberg_branch_selection_both_ways():
    """The sink decision, pinned in all four quadrants — the sandbox can
    only EXECUTE the parquet arm (test_pipeline.py does), so the branch
    logic itself is what must not drift."""
    assert select_branch("kg.db.triples", True) == "iceberg"
    assert select_branch("kg.db.triples", False) == "parquet"
    assert select_branch(None, True) == "parquet"
    assert select_branch(None, False) == "parquet"
