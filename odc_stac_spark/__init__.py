"""odc_stac_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``opendatacube/odc-stac``.

The reference (at /root/reference) is a Dask/xarray raster-loading engine;
this package re-expresses its data model and every operator Spark-first:

- **metadata plane**: STAC items as nested DataFrames (see
  :mod:`odc_stac_spark.sources.stac_items`), planned with Catalyst.
- **pixel plane**: a tiles DataFrame (band, t, iy, ix, data) produced by a
  grid-index equi-join (tile explode) + ``applyInPandas`` mosaic
  (see :mod:`odc_stac_spark.plans.load` / :mod:`odc_stac_spark.operators.mosaic`).
- **relational + LLM-pipeline surface**: dedup, similarity search, text
  analysis, streaming — all registered in :mod:`odc_stac_spark.queries`
  with DuckDB-oracle SQL for correctness gating.

Design notes for 100 TB scale live in docstrings next to each operator; the
guiding rules: declarative DataFrame plans (let Catalyst push down / prune),
broadcast small dimensions, no driver-side collect in the data path, and
Pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark

__all__ = ["get_spark", "__version__"]
