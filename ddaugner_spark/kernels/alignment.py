"""Wordpiece→token prediction alignment — the post-processing stack of
the reference's ``predict`` (/root/reference/ddaugner/predict.py:77-134)
and its featurization (/root/reference/ddaugner/datas/datas.py:228-283),
as pure kernels so the Arrow tagger exercises everything EXCEPT the BERT
forward (the one container-gated stub).

Semantics lifted verbatim:

* featurization — the sentence is concatenated with its left/right
  context at TOKEN level; ``tokens_labels_mask`` is 0 for context and 1
  for sentence tokens, built BEFORE tokenization (datas.py:265-272);
  wordpieces are ``[CLS] + pieces(words) + [SEP]`` truncated to
  ``max_length`` with the trailing special token kept (HF
  ``truncation=True`` behavior);
* alignment — per wordpiece j: ``token_to_word(j)`` is None for special
  tokens (skip), context tokens are skipped via the mask, and the tag
  written at ``word_index = t_j − prefix_tokens_nb`` is OVERWRITTEN by
  later wordpieces of the same token, so the LAST wordpiece's argmax
  wins (predict.py:93-106's ascending-j loop); tokens whose wordpieces
  were all truncated away keep the default ``"O"`` (predict.py:88);
* token embeddings — the per-token embedding is the MEAN over its
  surviving wordpieces of the last hidden state (predict.py:108-134).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .wordpiece import wordpiece_tokenize

CLS = "[CLS]"
SEP = "[SEP]"


def featurize_with_context(
    left_tokens: Sequence[str],
    sent_tokens: Sequence[str],
    right_tokens: Sequence[str],
    max_length: Optional[int] = 512,
) -> Tuple[List[str], List[Optional[int]], List[int]]:
    """(wordpieces, word_ids, tokens_labels_mask) for a sentence plus
    context (datas.py:228-283).  ``word_ids`` maps each wordpiece to its
    token index over left+sent+right (None for [CLS]/[SEP]); the mask is
    token-level and NOT truncated (it is built before tokenization)."""
    words = list(left_tokens) + list(sent_tokens) + list(right_tokens)
    mask = [0] * len(left_tokens) + [1] * len(sent_tokens) + [0] * len(right_tokens)
    pieces: List[str] = [CLS]
    word_ids: List[Optional[int]] = [None]
    for wi, w in enumerate(words):
        for p in wordpiece_tokenize(w):
            pieces.append(p)
            word_ids.append(wi)
    pieces.append(SEP)
    word_ids.append(None)
    if max_length is not None and len(pieces) > max_length:
        pieces = pieces[: max_length - 1] + [SEP]
        word_ids = word_ids[: max_length - 1] + [None]
    return pieces, word_ids, mask


def align_wordpiece_predictions(
    word_ids: Sequence[Optional[int]],
    mask: Sequence[int],
    wp_tags: Sequence[str],
) -> List[str]:
    """Map per-wordpiece predicted tags back to SENTENCE token tags
    (predict.py:77-106): skip special tokens (word id None) and context
    tokens (mask 0); later wordpieces of a token overwrite earlier ones;
    untagged tokens default to 'O'."""
    prefix_tokens_nb = 0
    for m in mask:
        if m == 1:
            break
        prefix_tokens_nb += 1
    tags_nb = sum(1 for m in mask if m == 1)
    out = ["O"] * tags_nb
    for j, t_j in enumerate(word_ids):
        if t_j is None:
            continue
        if mask[t_j] == 0:
            continue
        out[t_j - prefix_tokens_nb] = wp_tags[j]
    return out


def pool_token_embeddings(
    word_ids: Sequence[Optional[int]],
    mask: Sequence[int],
    wp_embeddings: Sequence[Sequence[float]],
) -> List[Optional[List[float]]]:
    """Per-sentence-token embeddings: mean over the token's surviving
    wordpieces of the per-wordpiece hidden vectors (predict.py:108-134).
    Tokens with no surviving wordpiece (truncated) yield None."""
    prefix_tokens_nb = 0
    for m in mask:
        if m == 1:
            break
        prefix_tokens_nb += 1
    tags_nb = sum(1 for m in mask if m == 1)
    sums: List[Optional[List[float]]] = [None] * tags_nb
    counts = [0] * tags_nb
    for j, t_j in enumerate(word_ids):
        if t_j is None or mask[t_j] == 0:
            continue
        w = t_j - prefix_tokens_nb
        v = wp_embeddings[j]
        if sums[w] is None:
            sums[w] = list(v)
        else:
            sums[w] = [a + b for a, b in zip(sums[w], v)]
        counts[w] += 1
    return [
        None if s is None else [x / c for x in s]
        for s, c in zip(sums, counts)
    ]
