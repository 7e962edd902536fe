"""Grid constructors and analytic fields as distributed DataFrames.

Reference semantics reproduced here (see SURVEY.md §1, §2A #25-28):

- ``_grid_1d`` (xesmf/util.py:6-28): bounds ``b_k = start + k*step`` via
  ``np.arange(start, end + step, step)``; centers are bound midpoints.
- ``grid_2d`` (xesmf/util.py:31-69): 2-D rectilinear grid = meshgrid of
  the two 1-D axes. Spark-native reading: a **cross join** of two tiny
  axis DataFrames (xesmf/frontend.py:21-30 ``as_2d_mesh``).
- ``grid_global`` (xesmf/util.py:72-98): grid_2d over [-180,180]x[-90,90]
  with a divisibility warning.
- ``wave_smooth`` (xesmf/data.py:8-44): the analytic benchmark field
  ``2 + cos^2(lat) * cos(2*lon)`` (radians) — a pure Column expression,
  used as the golden oracle everywhere.

Cell table schema (FIXTURES.md §1.1)::

    cell_id BIGINT   -- j * n_x + i, row-major flatten (xesmf/smm.py:89)
    j, i    BIGINT   -- 0-based lat/y and lon/x index
    lon, lat          DOUBLE  -- cell centers, degrees
    lon_lo, lon_hi, lat_lo, lat_hi  DOUBLE  -- cell bounds, degrees

Scale note: cells are generated with ``spark.range`` (distributed, no
driver-side materialization) and the 2-D table is a cross join of two
1-D axes — an n_y x n_x grid of any size never touches the driver.
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _arange_n(start: float, stop: float, step: float) -> int:
    """Length of ``np.arange(start, stop, step)`` without allocating it."""
    n = int(math.ceil((stop - start) / step))
    # guard against float error at the boundary (arange excludes stop)
    while start + (n - 1) * step >= stop:
        n -= 1
    while start + n * step < stop:
        n += 1
    return n


def grid_1d(
    spark: SparkSession, start_b: float, end_b: float, step: float, idx_name: str = "i"
) -> tuple[DataFrame, int]:
    """1-D axis table: ``(idx, lo, hi, c)`` — bounds and centers.

    Mirrors ``_grid_1d`` (xesmf/util.py:6-28): bounds are
    ``np.arange(start_b, end_b + step, step)``, centers are midpoints.
    Returns (axis DataFrame, n_cells).
    """
    n_bounds = _arange_n(start_b, end_b + step, step)
    n_cells = n_bounds - 1
    ax = spark.range(n_cells).select(
        F.col("id").alias(idx_name),
        (F.lit(float(start_b)) + F.col("id").cast("double") * F.lit(float(step))).alias("lo"),
        (F.lit(float(start_b)) + (F.col("id") + 1).cast("double") * F.lit(float(step))).alias(
            "hi"
        ),
    )
    ax = ax.withColumn("c", (F.col("lo") + F.col("hi")) / F.lit(2.0))
    return ax, n_cells


@dataclass
class Grid:
    """A 2-D quadrilateral mesh as a cell DataFrame + shape metadata.

    Spark analogue of the ESMF Grid object (xesmf/backend.py:55-114).
    ``shape = (n_y, n_x)``; ``periodic`` declares 360-degree longitude
    wrap (xesmf/backend.py:92-95, source grids only).
    """

    df: DataFrame
    shape: tuple[int, int]
    periodic: bool = False
    has_bounds: bool = True
    #: True when lon/lat are full 2-D fields (no separable axes) —
    #: weight builders must not derive 1-D axis tables from the cells
    curvilinear: bool = False
    #: horizontal dimension names, (y-like, x-like) — the analogue of
    #: the xarray dims the reference renames outputs to
    #: (xesmf/frontend.py:424-430); carried as metadata and used by the
    #: Regridder facade to name attached dim-index columns
    dims: tuple[str, str] = ("y", "x")
    # optional cached 1-D axis tables for rectilinear grids (tiny)
    lon_axis: DataFrame | None = dc_field(default=None, repr=False)
    lat_axis: DataFrame | None = dc_field(default=None, repr=False)

    @property
    def n_cells(self) -> int:
        return self.shape[0] * self.shape[1]

    @property
    def n_x(self) -> int:
        return self.shape[1]

    @property
    def n_y(self) -> int:
        return self.shape[0]

    def get_lon_axis(self) -> DataFrame:
        """1-D lon axis (i, lo, hi, c); derived from cells if not cached."""
        if self.lon_axis is not None:
            return self.lon_axis
        return self.df.select(
            F.col("i"),
            F.col("lon_lo").alias("lo"),
            F.col("lon_hi").alias("hi"),
            F.col("lon").alias("c"),
        ).distinct()

    def get_lat_axis(self) -> DataFrame:
        if self.lat_axis is not None:
            return self.lat_axis
        return self.df.select(
            F.col("j"),
            F.col("lat_lo").alias("lo"),
            F.col("lat_hi").alias("hi"),
            F.col("lat").alias("c"),
        ).distinct()


def grid_2d(
    spark: SparkSession,
    lon0_b: float,
    lon1_b: float,
    d_lon: float,
    lat0_b: float,
    lat1_b: float,
    d_lat: float,
    periodic: bool = False,
) -> Grid:
    """Rectilinear 2-D grid (xesmf/util.py:31-69) as a cell DataFrame.

    ``lat_axis CROSS JOIN lon_axis`` — the relational meshgrid.
    """
    lon_ax, n_x = grid_1d(spark, lon0_b, lon1_b, d_lon, "i")
    lat_ax, n_y = grid_1d(spark, lat0_b, lat1_b, d_lat, "j")
    cells = (
        lat_ax.select(
            F.col("j"),
            F.col("lo").alias("lat_lo"),
            F.col("hi").alias("lat_hi"),
            F.col("c").alias("lat"),
        )
        .crossJoin(
            lon_ax.select(
                F.col("i"),
                F.col("lo").alias("lon_lo"),
                F.col("hi").alias("lon_hi"),
                F.col("c").alias("lon"),
            )
        )
        .select(
            (F.col("j") * F.lit(n_x) + F.col("i")).alias("cell_id"),
            "j",
            "i",
            "lon",
            "lat",
            "lon_lo",
            "lon_hi",
            "lat_lo",
            "lat_hi",
        )
    )
    return Grid(
        df=cells,
        shape=(n_y, n_x),
        periodic=periodic,
        has_bounds=True,
        lon_axis=lon_ax,
        lat_axis=lat_ax,
    )


def grid_global(spark: SparkSession, d_lon: float, d_lat: float, periodic: bool = False) -> Grid:
    """Global grid (xesmf/util.py:72-98) with divisibility warnings."""
    if not float(360 / d_lon).is_integer():
        warnings.warn(f"360 cannot be divided by d_lon = {d_lon}, so the grid will not cover the entire globe")
    if not float(180 / d_lat).is_integer():
        warnings.warn(f"180 cannot be divided by d_lat = {d_lat}, so the grid will not cover the entire globe")
    return grid_2d(spark, -180.0, 180.0, d_lon, -90.0, 90.0, d_lat, periodic=periodic)


def grid_from_arrays(
    spark: SparkSession,
    lon,
    lat,
    lon_b=None,
    lat_b=None,
    periodic: bool = False,
) -> Grid:
    """Rectilinear grid from plain 1-D coordinate arrays (+ optional
    bounds arrays of length n+1) — the ingestion analogue of the
    reference accepting plain dicts (xesmf/frontend.py:58-60,
    tests/test_frontend.py:105-113). Without bounds the grid supports
    bilinear/nearest but not conservative (which needs cell corners —
    same gate as the reference, frontend.py:165-167).
    """
    lon = [float(v) for v in lon]
    lat = [float(v) for v in lat]
    has_bounds = lon_b is not None and lat_b is not None
    if (lon_b is None) != (lat_b is None):
        raise ValueError("provide both lon_b and lat_b, or neither")

    def axis_rows(centers, bounds, idx_name):
        if bounds is not None:
            bounds = [float(v) for v in bounds]
            if len(bounds) != len(centers) + 1:
                raise ValueError(
                    f"{idx_name}-bounds must have len(centers)+1 entries "
                    f"(got {len(bounds)} for {len(centers)})"
                )
            return [
                (k, bounds[k], bounds[k + 1], centers[k]) for k in range(len(centers))
            ]
        return [(k, None, None, centers[k]) for k in range(len(centers))]

    schema = "{} bigint, lo double, hi double, c double"
    lon_ax = spark.createDataFrame(axis_rows(lon, lon_b, "lon"), schema.format("i"))
    lat_ax = spark.createDataFrame(axis_rows(lat, lat_b, "lat"), schema.format("j"))
    n_x, n_y = len(lon), len(lat)
    cells = (
        lat_ax.select(
            F.col("j"),
            F.col("lo").alias("lat_lo"),
            F.col("hi").alias("lat_hi"),
            F.col("c").alias("lat"),
        )
        .crossJoin(
            lon_ax.select(
                F.col("i"),
                F.col("lo").alias("lon_lo"),
                F.col("hi").alias("lon_hi"),
                F.col("c").alias("lon"),
            )
        )
        .select(
            (F.col("j") * F.lit(n_x) + F.col("i")).alias("cell_id"),
            "j",
            "i",
            "lon",
            "lat",
            "lon_lo",
            "lon_hi",
            "lat_lo",
            "lat_hi",
        )
    )
    return Grid(
        df=cells,
        shape=(n_y, n_x),
        periodic=periodic,
        has_bounds=has_bounds,
        lon_axis=lon_ax,
        lat_axis=lat_ax,
    )


def grid_from_2d_arrays(
    spark: SparkSession, lon2d, lat2d, lon_b=None, lat_b=None, periodic: bool = False
) -> Grid:
    """CURVILINEAR grid from full 2-D lon/lat coordinate arrays (nested
    sequences or numpy), shape (n_y, n_x) — the reference's general
    2-D-mesh ingestion (xesmf/frontend.py:33-72 passes 2-D arrays to
    ESMF unchanged).

    ``lon_b``/``lat_b``: optional CORNER-NODE arrays of shape
    (n_y+1, n_x+1) — the reference's curvilinear bounds convention
    (xesmf/backend.py:101-114 ``add_corner``). With corners the grid
    supports conservative regridding (polygon clipping); each cell
    carries its 4-corner ring ``clon0..3 / clat0..3`` in node order
    (j,i) → (j,i+1) → (j+1,i+1) → (j+1,i). Without bounds: bilinear
    (point-in-quad) and nearest only, gated by the Regridder."""
    import numpy as np
    import pandas as pd

    lon2d = np.asarray(lon2d, dtype=np.float64)
    lat2d = np.asarray(lat2d, dtype=np.float64)
    if lon2d.ndim != 2 or lon2d.shape != lat2d.shape:
        raise ValueError("lon2d and lat2d must be equal-shaped 2-D arrays")
    n_y, n_x = lon2d.shape
    has_corners = lon_b is not None and lat_b is not None
    if (lon_b is None) != (lat_b is None):
        raise ValueError("provide both lon_b and lat_b, or neither")
    if has_corners:
        lon_b = np.asarray(lon_b, dtype=np.float64)
        lat_b = np.asarray(lat_b, dtype=np.float64)
        if lon_b.shape != (n_y + 1, n_x + 1) or lat_b.shape != lon_b.shape:
            raise ValueError(
                "corner arrays lon_b/lat_b must have shape (n_y+1, n_x+1)"
            )
    # vectorized assembly + ONE Arrow batch to the JVM — no per-cell
    # Python row list on the driver (a 1Mx-cell mesh would otherwise
    # materialize millions of tuples here)
    jj, ii = np.divmod(np.arange(n_y * n_x, dtype=np.int64), n_x)
    cols = {
        "cell_id": np.arange(n_y * n_x, dtype=np.int64),
        "j": jj,
        "i": ii,
        "lon": lon2d.ravel(),
        "lat": lat2d.ravel(),
    }
    schema = "cell_id bigint, j bigint, i bigint, lon double, lat double"
    if has_corners:
        # node ring (j,i) -> (j,i+1) -> (j+1,i+1) -> (j+1,i)
        ring = ((0, 0), (0, 1), (1, 1), (1, 0))
        for k, (dj, di) in enumerate(ring):
            cols[f"clon{k}"] = lon_b[dj : dj + n_y, di : di + n_x].ravel()
            cols[f"clat{k}"] = lat_b[dj : dj + n_y, di : di + n_x].ravel()
        schema += "".join(
            f", clon{k} double, clat{k} double" for k in range(4)
        )
    df = spark.createDataFrame(pd.DataFrame(cols), schema)
    for c in ("lon_lo", "lon_hi", "lat_lo", "lat_hi"):
        df = df.withColumn(c, F.lit(None).cast("double"))
    return Grid(
        df=df,
        shape=(n_y, n_x),
        periodic=periodic,
        has_bounds=has_corners,
        curvilinear=True,
    )


def locstream(spark: SparkSession, lons: list[float], lats: list[float]) -> Grid:
    """Point list ("LocStream", xesmf/frontend.py:75-102) as a Grid of
    shape (1, n) with no bounds — matches the reference's shape hack at
    frontend.py:102 (locstream treated as ``(1, n_locations)``).
    """
    if len(lons) != len(lats):
        raise ValueError("lon and lat must have the same length")
    rows = [
        (int(k), 0, int(k), float(lon), float(lat))
        for k, (lon, lat) in enumerate(zip(lons, lats))
    ]
    df = spark.createDataFrame(rows, "cell_id bigint, j bigint, i bigint, lon double, lat double")
    df = (
        df.withColumn("lon_lo", F.lit(None).cast("double"))
        .withColumn("lon_hi", F.lit(None).cast("double"))
        .withColumn("lat_lo", F.lit(None).cast("double"))
        .withColumn("lat_hi", F.lit(None).cast("double"))
    )
    return Grid(df=df, shape=(1, len(lons)), periodic=False, has_bounds=False)


def wave_smooth(lon: Column | str = "lon", lat: Column | str = "lat") -> Column:
    """Analytic benchmark field ``2 + cos^2(lat) * cos(2*lon)`` in radians
    (xesmf/data.py:8-44; Jones 1999 / Ullrich 2009). Pure Column expr —
    JVM-side, whole-stage-codegen friendly; the golden-oracle generator.
    """
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    return (
        F.lit(2.0)
        + F.pow(F.cos(F.radians(lat_c)), F.lit(2.0)) * F.cos(F.lit(2.0) * F.radians(lon_c))
    )


def wrap_lon(c: Column) -> Column:
    """Longitude wrapped into [-180, 180) — pure Column arithmetic.
    ``wrap_lon(x - ref) + ref`` localizes ``x`` into the frame of
    ``ref`` (within ±180°), the idiom the seam-aware builders use so a
    cell straddling the ±180° antimeridian stays CONTIGUOUS instead of
    exploding into a 360°-wide bbox."""
    return c - F.lit(360.0) * F.floor((c + F.lit(180.0)) / F.lit(360.0))


def count_degenerate_cells(grid: Grid) -> int:
    """Number of DEGENERATE cells — "triangles or lines, instead of
    quadrilaterals" (xesmf/frontend.py:148-150): a corner ring with
    fewer than 4 distinct nodes, or (near-)zero area in the equal-area
    map ``(radians(lon), sin(lat))`` the conservative builders measure
    in. Rectilinear grids are degenerate iff an interval bound
    collapses. One aggregate over the cell table — same O(cells) shape
    as the geometry digest the cache key already pays — MEMOIZED per
    (immutable) Grid object so repeated conservative Regridder
    constructions don't re-scan (same treatment as the geometry digest
    and the lat-range probe)."""
    cached = getattr(grid, "_n_degenerate", None)
    if cached is not None:
        return cached
    df = grid.df
    corner_cols = [f"c{ax}{k}" for k in range(4) for ax in ("lon", "lat")]
    if all(c in df.columns for c in corner_cols):
        ring = F.array(
            *[
                F.struct(
                    F.round(F.col(f"clon{k}"), 12).alias("x"),
                    F.round(F.col(f"clat{k}"), 12).alias("y"),
                )
                for k in range(4)
            ]
        )
        xs = [F.radians(F.col(f"clon{k}")) for k in range(4)]
        ys = [F.sin(F.radians(F.col(f"clat{k}"))) for k in range(4)]
        area2 = sum(
            xs[k] * ys[(k + 1) % 4] - xs[(k + 1) % 4] * ys[k] for k in range(4)
        )
        deg = (F.size(F.array_distinct(ring)) < 4) | (F.abs(area2) < F.lit(1e-16))
    elif grid.has_bounds:
        deg = (F.col("lon_hi") == F.col("lon_lo")) | (
            F.col("lat_hi") == F.col("lat_lo")
        )
    else:
        return 0
    n = df.filter(deg).count()
    object.__setattr__(grid, "_n_degenerate", n)
    return n


def validate_lat_range(grid: Grid) -> None:
    """Warn if any |lat| > 90 (xesmf/backend.py:40-52 ``warn_lat_range``).
    Memoized per Grid object — geometry is immutable once built, and the
    probe is a Spark job; re-running it on every Regridder construction
    dominated the cached-weights reuse latency."""
    bad = getattr(grid, "_lat_range_bad", None)
    if bad is None:
        bad = grid.df.filter(~F.col("lat").between(-90.0, 90.0)).limit(1).count()
        object.__setattr__(grid, "_lat_range_bad", bad)
    if bad:
        warnings.warn("Latitude is out of range [-90, 90]. Results are likely wrong.")
