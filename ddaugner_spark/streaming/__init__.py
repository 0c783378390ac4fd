from .incremental import (
    incremental_attribution,
    incremental_cm_sketch,
    incremental_dedup,
    incremental_upsert,
    incremental_event_counts,
    incremental_link_scores,
    incremental_links,
    incremental_mentions,
    incremental_ohlc,
    incremental_stream_join,
    incremental_trending,
    incremental_triples,
)

__all__ = [
    "incremental_attribution",
    "incremental_cm_sketch",
    "incremental_dedup",
    "incremental_upsert",
    "incremental_event_counts",
    "incremental_link_scores",
    "incremental_links",
    "incremental_mentions",
    "incremental_ohlc",
    "incremental_stream_join",
    "incremental_trending",
    "incremental_triples",
]
