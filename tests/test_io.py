"""Tests for netCDF weight interop and array-based grid ingestion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xesmf_spark.grids import grid_from_arrays, grid_global
from xesmf_spark.netcdf3 import read_netcdf3, write_netcdf3
from xesmf_spark.weights import (
    bilinear_weights,
    conservative_weights,
    read_weights_netcdf,
    write_weights_netcdf,
)


@pytest.fixture(scope="module")
def g_in(spark):
    return grid_global(spark, 20, 12)


@pytest.fixture(scope="module")
def g_out(spark):
    return grid_global(spark, 15, 9)


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "t.nc")
    S = np.array([0.5, 0.25, 1.0])
    col = np.array([1, 2, 3], dtype=np.int32)
    row = np.array([7, 8, 9], dtype=np.int32)
    write_netcdf3(p, {"n_s": 3}, {"S": (("n_s",), S), "col": (("n_s",), col), "row": (("n_s",), row)})
    dims, variables = read_netcdf3(p)
    assert dims == {"n_s": 3}
    np.testing.assert_array_equal(variables["S"], S)
    np.testing.assert_array_equal(variables["col"], col)
    np.testing.assert_array_equal(variables["row"], row)


def test_weight_netcdf_roundtrip(spark, g_in, g_out, tmp_path):
    """Export the engine's bilinear weights to the ESMF netCDF triplet
    layout (1-based), re-import (1->0-based fix, xesmf/smm.py:36-37),
    differential-match exactly."""
    p = str(tmp_path / "w.nc")
    w = bilinear_weights(g_in, g_out)
    write_weights_netcdf(w, p)
    w2 = read_weights_netcdf(spark, p, n_in=g_in.n_cells, n_out=g_out.n_cells)
    assert w2.count() == w.count()
    assert w.exceptAll(w2).count() == 0
    # 1-based on disk: raw min index is 1, not 0
    from xesmf_spark.netcdf3 import read_netcdf3 as rd

    _, raw = rd(p)
    assert raw["row"].min() >= 1 and raw["col"].min() >= 1


def test_weight_netcdf_shape_check(spark, g_in, g_out, tmp_path):
    p = str(tmp_path / "w.nc")
    write_weights_netcdf(bilinear_weights(g_in, g_out), p)
    with pytest.raises(ValueError, match="shape"):
        read_weights_netcdf(spark, p, n_in=4, n_out=4)


def test_grid_from_arrays_matches_constructor(spark):
    """Building the fixture grid from plain arrays (the reference's
    dict-ingestion path, frontend.py:58-60) must yield identical
    conservative weights to grid_global."""
    ref = grid_global(spark, 20, 12)
    lon_b = [-180 + 20 * k for k in range(19)]
    lat_b = [-90 + 12 * k for k in range(16)]
    lon = [(lon_b[k] + lon_b[k + 1]) / 2 for k in range(18)]
    lat = [(lat_b[k] + lat_b[k + 1]) / 2 for k in range(15)]
    g = grid_from_arrays(spark, lon, lat, lon_b=lon_b, lat_b=lat_b)
    assert g.shape == ref.shape
    dst = grid_global(spark, 15, 9)
    wa = conservative_weights(ref, dst)
    wb = conservative_weights(g, dst)
    assert wa.exceptAll(wb).count() == 0 and wb.exceptAll(wa).count() == 0


def test_grid_from_arrays_no_bounds_gates_conservative(spark):
    g = grid_from_arrays(spark, [0.0, 1.0], [0.0, 1.0])
    assert not g.has_bounds
    from xesmf_spark import Regridder

    dst = grid_global(spark, 15, 9)
    with pytest.raises((KeyError, ValueError)):
        Regridder(spark, g, dst, "conservative")
