"""xrlite labeled arrays (odc_stac_spark/xrlite.py) — the functional
xarray work-alike behind the S13 Dataset sink. Semantics are checked
against the xarray idioms odc-stac users actually write (isel/sel,
nearest lookup, descending-y slices, NDVI arithmetic, time reductions,
to_dataframe)."""

import numpy as np
import pandas as pd
import pytest

from odc_stac_spark.xrlite import DataArray, Dataset

Y = np.array([95.0, 85.0, 75.0, 65.0])  # descending, like north-up rasters
X = np.array([10.0, 20.0, 30.0])
T = np.array(["2020-01-01", "2020-02-01"], dtype="datetime64[ns]")


def _da(name="red", mult=1):
    vals = (np.arange(24).reshape(2, 4, 3) * mult).astype(np.float64)
    return DataArray(
        vals, ("time", "y", "x"), {"time": T, "y": Y, "x": X}, name=name
    )


def test_isel_int_drops_dim_slice_keeps():
    da = _da()
    one = da.isel(time=0)
    assert one.dims == ("y", "x") and one.shape == (4, 3)
    assert (one.values == np.arange(12).reshape(4, 3)).all()
    sl = da.isel(y=slice(1, 3))
    assert sl.dims == ("time", "y", "x") and sl.shape == (2, 2, 3)
    assert (sl.coords["y"] == Y[1:3]).all()


def test_sel_exact_and_nearest():
    da = _da()
    assert da.sel(x=20.0).shape == (2, 4)
    assert float(da.sel(x=20.0, y=85.0).isel(time=0).values) == 4.0
    near = da.sel(x=22.4, y=88.0, method="nearest")
    assert (near.values == da.sel(x=20.0, y=85.0).values).all()
    with pytest.raises(KeyError):
        da.sel(x=22.4)  # exact lookup on a missing label


def test_sel_slice_follows_descending_coords():
    da = _da()
    # xarray convention: slice endpoints follow coordinate order
    sub = da.sel(y=slice(90.0, 70.0))
    assert (sub.coords["y"] == np.array([85.0, 75.0])).all()
    subx = da.sel(x=slice(15.0, 35.0))
    assert (subx.coords["x"] == np.array([20.0, 30.0])).all()


def test_ndvi_style_arithmetic():
    red = _da("red")
    nir = _da("nir", mult=3)
    ndvi = (nir - red) / (nir + red + 1e-9)
    assert ndvi.dims == ("time", "y", "x")
    expect = (3.0 - 1.0) / (3.0 + 1.0)
    assert abs(float(ndvi.values[0, 0, 1]) - expect) < 1e-6


def test_broadcast_by_dim_name():
    da = _da()
    anomaly = da - da.mean("time")  # (y, x) broadcast back over time
    assert anomaly.dims == ("time", "y", "x")
    assert np.allclose(anomaly.values[0] + anomaly.values[1], 0)
    # and a pure-y array broadcasts into (time, y, x)
    yw = DataArray(np.ones(4), ("y",), {"y": Y})
    assert (da * yw).shape == da.shape


def test_reductions_and_nan_skipping():
    da = _da()
    m = da.mean("time")
    assert m.dims == ("y", "x") and float(m.values[0, 0]) == 6.0
    v = da.values.copy()
    v[0, 0, 0] = np.nan
    da2 = DataArray(v, da.dims, da.coords)
    assert float(da2.mean("time").values[0, 0]) == 12.0  # nan skipped
    assert isinstance(da.sum(), float) or np.isscalar(da.sum()) or da.sum().ndim == 0


def test_where_masks_to_nan():
    da = _da()
    masked = da.where(da > 5.0)
    assert np.isnan(masked.values[0, 0, 0])
    assert masked.values[1, 0, 0] == 12.0
    filled = da.where(da > 5.0, -1)
    assert filled.values[0, 0, 0] == -1


def test_to_pandas_and_to_dataframe():
    da = _da().isel(time=0)
    df = da.to_pandas()
    assert isinstance(df, pd.DataFrame) and df.shape == (4, 3)
    assert list(df.columns) == list(X)
    long = _da().to_dataframe("red")
    assert long.shape == (24, 1)
    assert long.index.names == ["time", "y", "x"]


def test_dataset_access_and_mapped_sel():
    ds = Dataset(
        {"red": _da("red"), "nir": _da("nir", 3)},
        coords={"time": T, "y": Y, "x": X},
        attrs={"crs": "EPSG:32635"},
    )
    assert ds.dims == {"time": 2, "y": 4, "x": 3}
    assert ds["red"] is ds.data_vars["red"]
    assert ds.nir.name == "nir"
    sub = ds.isel(time=0)
    assert sub.red.dims == ("y", "x")
    near = ds.sel(x=21.0, method="nearest")
    assert near.red.shape == (2, 4)
    df = ds.to_dataframe()
    assert set(df.columns) == {"red", "nir"}
    assert df.shape == (24, 2)


def test_load_dataset_is_functional(spark):
    # the S13 sink object itself supports the xarray idioms end-to-end
    from tests.test_load_pipeline import CRS, mk_item  # reuse fixture helpers
    from odc_stac_spark.plans.load import assemble_dataset, load, plan_load

    items = [mk_item(0, nodata=-1)]
    plan = plan_load(items, chunks=(32, 32))
    tiles_df, _ = load(spark, items, plan=plan)
    ds = assemble_dataset(tiles_df, plan)
    da = ds.red  # attribute access
    assert da.dims == ("time", "y", "x")
    assert da.attrs["crs"] == CRS
    one = da.isel(time=0)
    assert one.shape == ds.bands["red"].shape[1:]
    # nearest-neighbour spatial lookup hits the expected pixel-center
    v = da.sel(y=float(ds.y[2]) + 2.0, x=float(ds.x[1]) - 3.0, method="nearest")
    assert float(v.isel(time=0).values) == float(ds.bands["red"][0, 2, 1])
    assert ds.isel(time=0).red.dims == ("y", "x")


def test_coord_validation():
    with pytest.raises(ValueError, match="length mismatch"):
        DataArray(np.zeros((2, 3)), ("a", "b"), {"a": np.arange(5)})
    with pytest.raises(ValueError, match="not in dims"):
        DataArray(np.zeros(3), ("a",), {"z": np.arange(3)})
    da = _da()
    with pytest.raises(ValueError, match="broadcast"):
        other = DataArray(np.zeros(5), ("q",), {"q": np.arange(5)})
        _ = da + other
