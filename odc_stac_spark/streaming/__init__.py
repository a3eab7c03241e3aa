from .events import (
    infer_collections_stateful,
    stream_events,
    stream_tumbling_counts,
)

__all__ = ["infer_collections_stateful", "stream_events", "stream_tumbling_counts"]
