from .events import (
    infer_collections_stateful,
    stream_click_attribution,
    stream_dedup,
    stream_events,
    stream_session_windows,
    stream_stac_items,
    stream_tumbling_counts,
)
from .ingest import compact_cube, cube_zonal_stats, stream_load_tiles

__all__ = [
    "infer_collections_stateful",
    "stream_click_attribution",
    "stream_dedup",
    "compact_cube",
    "cube_zonal_stats",
    "stream_events",
    "stream_load_tiles",
    "stream_session_windows",
    "stream_stac_items",
    "stream_tumbling_counts",
]
