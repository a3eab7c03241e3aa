from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.plans.load import assemble_numpy, load
from odc_stac_spark.sources.sinks import read_tiles_parquet, write_cog, write_tiles_parquet


def test_tiles_parquet_roundtrip(spark, tmp_path):
    from .test_load_pipeline import mk_item

    items = [mk_item(0), mk_item(1, origin=(300.0, 1000.0))]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(48, 48))
    out = str(tmp_path / "tiles")
    write_tiles_parquet(tiles_df, out)
    back = read_tiles_parquet(spark, out)
    # partition pruning works: band/t are partition columns
    assert set(back.columns) == set(tiles_df.columns)
    a = assemble_numpy(tiles_df, plan)
    b = assemble_numpy(
        back.withColumn("band", back["band"].cast("string")).withColumn(
            "t", back["t"].cast("int")
        ),
        plan,
    )
    np.testing.assert_array_equal(a["red"], b["red"])


def test_cog_sink_clearly_stubbed(spark):
    with pytest.raises(NotImplementedError, match="rasterio"):
        write_cog(None, "/tmp/x.tif")
