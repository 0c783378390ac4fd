"""WordPiece tokenization — the REAL greedy longest-match-first
algorithm (HuggingFace ``BertTokenizer``'s WordPiece; the reference uses
it via ``transformers`` in lexical_overlap.py:53-78 and predict.py).

The container has no transformers, so the vocabulary is the engine's
own (config.WORDPIECE_START / WORDPIECE_CONT — a pure-function-of-
nothing dictionary like the gazetteer, so the DuckDB oracle can replay
tokenization exactly); a real ``vocab.txt`` drops in by passing its
start/continuation piece sets.

Algorithm (greedy, per word):

    pos = 0
    while pos < len(word):
        take the LONGEST piece p (≤ MAX_PIECE chars) with
            word[pos:pos+|p|] ∈ (START set if pos == 0 else CONT set)
        if none exists → the whole word becomes [UNK]
        emit p  (rendered '##p' when pos > 0); pos += |p|
"""

from __future__ import annotations

from typing import List, Sequence

from .. import config


def wordpiece_tokenize(
    word: str,
    start: Sequence[str] | None = None,
    cont: Sequence[str] | None = None,
    max_piece: int | None = None,
) -> List[str]:
    start = set(start if start is not None else config.WORDPIECE_START)
    cont = set(cont if cont is not None else config.WORDPIECE_CONT)
    max_piece = max_piece or config.WORDPIECE_MAX
    pieces: List[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        vocab = start if pos == 0 else cont
        took = None
        for ln in range(min(max_piece, n - pos), 0, -1):
            cand = word[pos : pos + ln]
            if cand in vocab:
                took = cand
                break
        if took is None:
            return ["[UNK]"]
        pieces.append(took if pos == 0 else "##" + took)
        pos += len(took)
    return pieces
