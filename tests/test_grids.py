"""Grid-constructor tests — port of xesmf/tests/test_util.py:5-21."""

import pytest

from pyspark.sql import functions as F

from xesmf_spark.grids import grid_global, locstream, wave_smooth


def test_grid_global_shapes(spark):
    g = grid_global(spark, 1.5, 1.5)
    assert g.shape == (120, 240)  # test_util.py:5-13
    assert g.df.count() == 120 * 240


def test_grid_global_fixture_grids(spark):
    g_in = grid_global(spark, 20, 12)
    g_out = grid_global(spark, 15, 9)
    assert g_in.shape == (15, 18)
    assert g_out.shape == (20, 24)
    row = g_in.df.orderBy("cell_id").first()
    assert row["lon"] == -170.0 and row["lat"] == -84.0
    assert row["lon_lo"] == -180.0 and row["lon_hi"] == -160.0


def test_grid_global_bad_resolution_warns(spark):
    with pytest.warns(UserWarning):
        grid_global(spark, 1.23, 1.0)  # test_util.py:16-21
    with pytest.warns(UserWarning):
        grid_global(spark, 1.0, 1.23)


def test_wave_smooth_range(spark):
    g = grid_global(spark, 20, 12)
    # field is 2 + cos^2(lat)cos(2lon) in [1, 3]
    vals = g.df.select(wave_smooth().alias("v")).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    assert 1.0 <= vals["lo"] <= vals["hi"] <= 3.0


def test_locstream(spark):
    g = locstream(spark, [0.0, 5.0, 10.0, 15.0], [-20.0, -10.0, 0.0, 10.0])
    assert g.shape == (1, 4)
    assert not g.has_bounds
    assert g.df.count() == 4
