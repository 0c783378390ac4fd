from .wordpiece import wordpiece_tokenize
from .alignment import (
    align_wordpiece_predictions,
    featurize_with_context,
    pool_token_embeddings,
)
from .bio import (
    Entity,
    entities_from_bio_tags,
    entities_to_bio_tags,
    search_ner_pattern,
    replace_entity_occurrences,
    majority_voting,
)

__all__ = [
    "wordpiece_tokenize",
    "align_wordpiece_predictions",
    "featurize_with_context",
    "pool_token_embeddings",
    "Entity",
    "entities_from_bio_tags",
    "entities_to_bio_tags",
    "search_ner_pattern",
    "replace_entity_occurrences",
    "majority_voting",
]
