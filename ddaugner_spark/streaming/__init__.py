from .incremental import incremental_event_counts, incremental_mentions

__all__ = ["incremental_event_counts", "incremental_mentions"]
