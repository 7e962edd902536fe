"""Native-array ingestion facade — ports of the reference's frontend
tests that drive ``regridder(numpy_array)`` / ``regridder(DataArray)``
(xesmf/tests/test_frontend.py:117-137 periodic pair,
test_frontend.py:175-200 regrid_dataarray/broadcasting). xarray is not
installed in this container, so the DataArray/Dataset paths are gated
tests; the numpy path — the shared compute core of all of them — is
exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from xesmf_spark.grids import grid_global, grid_from_arrays
from xesmf_spark.regridder import Regridder, _try_import_xarray


def _lonlat(grid):
    pdf = grid.df.select("cell_id", "lon", "lat").orderBy("cell_id").toPandas()
    return (
        pdf["lon"].to_numpy().reshape(grid.shape),
        pdf["lat"].to_numpy().reshape(grid.shape),
    )


def _wave(lon, lat):
    # xesmf/data.py:8-44 analytic benchmark field
    return 2.0 + np.cos(np.radians(lat)) ** 2 * np.cos(2.0 * np.radians(lon))


@pytest.fixture(scope="module")
def grids(spark):
    g_in = grid_global(spark, 20, 12)
    g_out = grid_global(spark, 15, 9)
    return g_in, g_out


def test_regrid_numpy_conservative(spark, grids):
    # test_frontend.py:175-192 numpy portion
    g_in, g_out = grids
    rg = Regridder(spark, g_in, g_out, "conservative")
    lon_i, lat_i = _lonlat(g_in)
    lon_o, lat_o = _lonlat(g_out)
    out = rg(_wave(lon_i, lat_i))  # ndarray dispatch through __call__
    assert out.shape == g_out.shape
    ref = _wave(lon_o, lat_o)
    rel = np.abs((ref - out) / ref)
    assert np.max(rel) < 0.05


def test_regrid_numpy_periodic_wrong_and_correct(spark, grids):
    # test_frontend.py:117-137: without periodic the seam cells are
    # unmapped (-> 0, rel err exactly 1); with periodic the wrap-union
    # brackets close the seam
    g_in, g_out = grids
    lon_i, lat_i = _lonlat(g_in)
    lon_o, lat_o = _lonlat(g_out)
    data, ref = _wave(lon_i, lat_i), _wave(lon_o, lat_o)

    out_wrong = Regridder(spark, g_in, g_out, "bilinear")(data)
    rel = np.abs((ref - out_wrong) / ref)
    assert np.max(rel) == 1.0

    g_in_p = grid_global(spark, 20, 12, periodic=True)
    out_right = Regridder(spark, g_in_p, g_out, "bilinear", periodic=True)(data)
    rel = np.abs((ref - out_right) / ref)
    assert np.max(rel) < 0.065


def test_regrid_numpy_4d_broadcast(spark, grids):
    # test_frontend.py:194-200: extra (time, lev) dims broadcast through
    # the SpMV; by linearity every slice must equal its scalar multiple
    # of the 2-D result
    g_in, g_out = grids
    rg = Regridder(spark, g_in, g_out, "conservative")
    lon_i, lat_i = _lonlat(g_in)
    data2d = _wave(lon_i, lat_i)
    time = np.arange(1, 5)[:, None, None, None]
    lev = np.arange(1, 4)[None, :, None, None]
    data4d = time * lev * data2d[None, None]
    out4d = rg(data4d)
    out2d = rg(data2d)
    assert out4d.shape == (4, 3) + g_out.shape
    expect = time * lev * out2d[None, None]
    np.testing.assert_allclose(out4d, expect, rtol=1e-12, atol=1e-12)


def test_regrid_numpy_from_1d_axes(spark):
    # test_frontend.py:105-113 + 151-168: grids built from plain 1-D
    # coordinate arrays (the dict-construction UX) regrid identically
    lon_axis = np.arange(-170.0, 180.0, 20.0)
    lat_axis = np.arange(-84.0, 90.0, 12.0)
    lon_axis_o = np.arange(-172.5, 180.0, 15.0)
    lat_axis_o = np.arange(-85.5, 90.0, 9.0)
    g_in = grid_from_arrays(spark, lon_axis, lat_axis, periodic=True)
    g_out = grid_from_arrays(spark, lon_axis_o, lat_axis_o)
    rg = Regridder(spark, g_in, g_out, "bilinear", periodic=True)
    data = _wave(lon_axis[None, :], lat_axis[:, None])
    out = rg(data)
    ref = _wave(lon_axis_o[None, :], lat_axis_o[:, None])
    rel = np.abs((ref - out) / ref)
    assert np.max(rel) < 0.065


def test_regrid_numpy_shape_validation(spark, grids):
    g_in, g_out = grids
    rg = Regridder(spark, g_in, g_out, "bilinear")
    with pytest.raises(ValueError):
        rg(np.zeros((3, 4)))
    with pytest.raises(TypeError):
        rg("not a field")


def test_xarray_facade_gated(spark, grids):
    # without xarray the DataArray path must fail with a clear message,
    # not an AttributeError mid-regrid
    if _try_import_xarray() is not None:
        pytest.skip("xarray present; gate not reachable")
    g_in, g_out = grids
    rg = Regridder(spark, g_in, g_out, "bilinear")
    with pytest.raises(ImportError, match="xarray"):
        rg.regrid_dataarray(object())
