from .wordpiece import wordpiece_tokenize
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
    "Entity",
    "entities_from_bio_tags",
    "entities_to_bio_tags",
    "search_ner_pattern",
    "replace_entity_occurrences",
    "majority_voting",
]
