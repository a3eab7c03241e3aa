from .continuous import (
    continuous_aggregate,
    read_continuous,
    rollup_to_day,
    serve_with_tail,
)
from .dedup import build_minhash_index, match_against_index, stream_dedup_minhash
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
    "build_minhash_index",
    "continuous_aggregate",
    "match_against_index",
    "read_continuous",
    "rollup_to_day",
    "serve_with_tail",
    "stream_dedup_minhash",
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
