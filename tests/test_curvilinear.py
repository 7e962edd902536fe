"""Curvilinear (2-D mesh) bilinear regridding tests."""

import math

import pytest
from pyspark.sql import functions as F

from xesmf_spark.apply import smm_apply
from xesmf_spark.grids import grid_from_2d_arrays, grid_global, wave_smooth
from xesmf_spark.weights import bilinear_weights
from xesmf_spark.weights.curvilinear import bilinear_weights_curvilinear


def test_rectilinear_as_curvilinear_matches(spark):
    """A rectilinear grid expressed as a 2-D mesh must reproduce the
    separable bilinear result EXACTLY on every destination cell inside
    the center mesh (the curvilinear path claims no wrap/pole rows)."""
    g_in = grid_global(spark, 20, 12)
    g_out = grid_global(spark, 15, 9)
    w_curv = bilinear_weights_curvilinear(g_in, g_out)
    w_rect = bilinear_weights(g_in, g_out, periodic=False)
    field = g_in.df.select("cell_id", wave_smooth().alias("value"))
    a = {r.cell_id: r.value for r in smm_apply(field, w_curv, g_out).collect()}
    b = {r.cell_id: r.value for r in smm_apply(field, w_rect, g_out).collect()}
    mapped = {r.row for r in w_curv.select("row").distinct().collect()}
    assert len(mapped) > 0.7 * len(b)
    assert max(abs(a[k] - b[k]) for k in mapped) == 0.0


def _rotated_mesh(n_y, n_x, angle_deg):
    """A genuinely curvilinear mesh: a regional grid rotated in the
    lon/lat plane around (0, 0)."""
    th = math.radians(angle_deg)
    lon2d, lat2d = [], []
    for j in range(n_y):
        lon_row, lat_row = [], []
        for i in range(n_x):
            x = -30.0 + 60.0 * i / (n_x - 1)
            y = -20.0 + 40.0 * j / (n_y - 1)
            lon_row.append(x * math.cos(th) - y * math.sin(th))
            lat_row.append(x * math.sin(th) + y * math.cos(th))
        lon2d.append(lon_row)
        lat2d.append(lat_row)
    return lon2d, lat2d


def test_rotated_grid_bilinear_tolerance(spark):
    """Bilinear from a rotated (curvilinear) source mesh onto interior
    points reproduces the analytic wave field within interpolation
    error (the curvilinear twin of the reference's analytic-oracle
    pattern, tests/test_frontend.py:130-137)."""
    from xesmf_spark.grids import locstream

    lon2d, lat2d = _rotated_mesh(25, 37, angle_deg=20.0)
    src = grid_from_2d_arrays(spark, lon2d, lat2d)
    assert src.curvilinear and not src.has_bounds

    # interior destination points (inside the rotated rectangle)
    pts_lon, pts_lat = [], []
    th = math.radians(20.0)
    for k in range(60):
        x = -24.0 + 48.0 * (k % 10) / 9
        y = -15.0 + 30.0 * (k // 10) / 5
        pts_lon.append(x * math.cos(th) - y * math.sin(th))
        pts_lat.append(x * math.sin(th) + y * math.cos(th))
    dst = locstream(spark, pts_lon, pts_lat)

    w = bilinear_weights(src, dst)  # dispatches to the curvilinear path
    field = src.df.select("cell_id", wave_smooth().alias("value"))
    out = smm_apply(field, w, dst)
    rows = out.collect()
    assert len(rows) == 60
    max_rel = 0.0
    for r in rows:
        truth = 2.0 + math.cos(math.radians(r.lat)) ** 2 * math.cos(
            2.0 * math.radians(r.lon)
        )
        max_rel = max(max_rel, abs(r.value - truth) / abs(truth))
    # every point is inside the mesh -> every point got weights
    assert min(abs(r.value) for r in rows) > 0.5
    assert max_rel < 0.02, max_rel


def test_weights_rows_sum_to_one(spark):
    """Bilinear weights per mapped destination sum to 1 (partition of
    unity — u,v products), curvilinear path included."""
    lon2d, lat2d = _rotated_mesh(15, 21, angle_deg=35.0)
    src = grid_from_2d_arrays(spark, lon2d, lat2d)
    g_out = grid_global(spark, 15, 9)
    w = bilinear_weights(src, g_out)
    sums = w.groupBy("row").agg(F.sum("S").alias("s"))
    bad = sums.filter(F.abs(F.col("s") - 1.0) > 1e-9).count()
    assert bad == 0
