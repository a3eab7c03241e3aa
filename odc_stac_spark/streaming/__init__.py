from .events import (
    infer_collections_stateful,
    stream_click_attribution,
    stream_dedup,
    stream_events,
    stream_session_windows,
    stream_tumbling_counts,
)

__all__ = [
    "infer_collections_stateful",
    "stream_click_attribution",
    "stream_dedup",
    "stream_events",
    "stream_session_windows",
    "stream_tumbling_counts",
]
