"""Multimodal queries surfaced through the driver contract (rows-only —
binary payload semantics are byte-exact-tested in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import decode_metadata, demo_media_df, image_stats
from . import register


@register(
    "mm_image_metadata",
    oracle=None,
    doc="multimodal: binary media column → typed metadata via header-only "
    "mapInPandas parse (no payload copy).",
    tags=("multimodal",),
)
def mm_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_metadata(demo_media_df(spark, sf_dir))


@register(
    "mm_image_stats",
    oracle=None,
    doc="multimodal: per-image feature extraction (decode + numpy stats) "
    "over Arrow batches — the model-forward-pass slot.",
    tags=("multimodal",),
)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_stats(demo_media_df(spark, sf_dir))
