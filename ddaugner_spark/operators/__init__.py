from . import (
    mentions,
    sentences,
    scoring,
    triples,
    linking,
    canonical,
    dedup,
    similarity,
    textstats,
    augment,
    multimodal,
    tagging,
)

__all__ = [
    "mentions",
    "sentences",
    "scoring",
    "triples",
    "linking",
    "canonical",
    "dedup",
    "similarity",
    "textstats",
    "augment",
    "multimodal",
    "tagging",
]
