"""Pixel-plane queries (registered once the load pipeline lands).

See odc_stac_spark/plans/load.py for the tile-explode → mapInPandas mosaic
pipeline. Raster queries get rows-only checks (no SQL oracle) plus
pixel-exact numpy-reference tests in tests/test_load_pipeline.py.
"""

from __future__ import annotations
