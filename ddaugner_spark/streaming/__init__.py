from .incremental import (
    incremental_event_counts,
    incremental_mentions,
    incremental_triples,
)

__all__ = [
    "incremental_event_counts",
    "incremental_mentions",
    "incremental_triples",
]
