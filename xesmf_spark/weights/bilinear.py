"""Bilinear regridding weights for rectilinear grids (SURVEY.md §2B-3).

Reference: ``method='bilinear'`` (xesmf/backend.py:241). For rectilinear
grids the interpolation separates per axis: bracket each destination
coordinate between the two nearest source centers, 1-D linear weights,
tensor product of the two axes → ≤4 nnz per destination cell.

Periodic longitude (xesmf/backend.py:92-95): the source lon axis is
UNIONed with ±360°-shifted copies before the bracketing join, so
destination cells past the last source column wrap around. Without it
they get no weights → 0 on apply (unmapped_action=IGNORE,
tests/test_frontend.py:116-127 asserts max rel err == exactly 1.0).

Pole handling: ESMPy defaults ``pole_method=ALLAVG`` for non-conservative
methods on periodic grids — destination points poleward of the outermost
source-center row interpolate between that row and a virtual pole point
whose value is the MEAN of the whole row. Encoded here as extra weight
triplets ``S = w_pole / n_x`` spread over every cell of the adjacent row.

Spark plan: all joins involve only the tiny 1-D axis tables (O(n_x+n_y)
rows), broadcast; the O(nnz) triplet output is produced by one cross
combine. Nothing here scales with n_cells^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xesmf_spark.grids import Grid


def _axis_bracket(
    src_ax: DataFrame, dst_ax: DataFrame, idx_dst: str, periodic: bool = False
) -> DataFrame:
    """Bracketing range join of dest centers into adjacent-src-center
    intervals. Returns ``(idx_dst, k, w)``: source index + linear weight
    (two rows per bracketed dest element; zero-weight rows dropped).
    """
    s = src_ax.select(F.col(src_ax.columns[0]).alias("k"), F.col("c"))
    if periodic:
        s = (
            s.unionByName(s.select("k", (F.col("c") - 360.0).alias("c")))
            .unionByName(s.select("k", (F.col("c") + 360.0).alias("c")))
        )
    # adjacent center pairs, ordered by coordinate — axis tables are tiny
    # (O(n) rows), so a single-partition window is fine here.
    win = Window.orderBy("c")
    pairs = s.select(
        F.col("k").alias("k_lo"),
        F.col("c").alias("c_lo"),
        F.lead("k").over(win).alias("k_hi"),
        F.lead("c").over(win).alias("c_hi"),
    ).filter(F.col("k_hi").isNotNull())

    d = dst_ax.select(F.col(dst_ax.columns[0]).alias(idx_dst), F.col("c").alias("x"))
    br = d.join(
        F.broadcast(pairs),
        (F.col("x") >= F.col("c_lo")) & (F.col("x") <= F.col("c_hi")),
        "inner",
    )
    # a dest center equal to an interior src center matches two brackets;
    # keep one deterministically (equivalent weights either way)
    br = (
        br.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(idx_dst).orderBy(F.col("c_lo"))),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_hi = (F.col("x") - F.col("c_lo")) / (F.col("c_hi") - F.col("c_lo"))
    out = br.select(idx_dst, F.col("k_lo").alias("k"), (F.lit(1.0) - w_hi).alias("w")).unionByName(
        br.select(idx_dst, F.col("k_hi").alias("k"), w_hi.alias("w"))
    )
    return out.filter(F.col("w") > 0.0)


def _pole_brackets(
    src_lat_ax: DataFrame, dst_lat_ax: DataFrame, n_y: int, idx_dst: str = "dj"
) -> DataFrame:
    """Lat brackets for dest centers poleward of the outermost src-center
    rows, against virtual poles at ±90. Virtual index: -1 = south pole,
    ``n_y`` = north pole. Returns (idx_dst, k, w) like ``_axis_bracket``.
    """
    s = src_lat_ax.select(F.col(src_lat_ax.columns[0]).alias("k"), "c")
    # outermost rows (tiny table -> min/max via agg, broadcast)
    ext = s.agg(
        F.min_by("k", "c").alias("k_bot"),
        F.min("c").alias("c_bot"),
        F.max_by("k", "c").alias("k_top"),
        F.max("c").alias("c_top"),
    )
    d = dst_lat_ax.select(F.col(dst_lat_ax.columns[0]).alias(idx_dst), F.col("c").alias("x"))
    d = d.crossJoin(F.broadcast(ext))

    north = d.filter(F.col("x") > F.col("c_top"))
    w_pole_n = (F.col("x") - F.col("c_top")) / (F.lit(90.0) - F.col("c_top"))
    north_rows = north.select(idx_dst, F.col("k_top").alias("k"), (F.lit(1.0) - w_pole_n).alias("w")).unionByName(
        north.select(idx_dst, F.lit(n_y).alias("k"), w_pole_n.alias("w"))
    )

    south = d.filter(F.col("x") < F.col("c_bot"))
    w_pole_s = (F.col("c_bot") - F.col("x")) / (F.col("c_bot") - F.lit(-90.0))
    south_rows = south.select(idx_dst, F.col("k_bot").alias("k"), (F.lit(1.0) - w_pole_s).alias("w")).unionByName(
        south.select(idx_dst, F.lit(-1).cast("bigint").alias("k"), w_pole_s.alias("w"))
    )
    return north_rows.unionByName(south_rows).filter(F.col("w") > 0.0)


def bilinear_weights(src: Grid, dst: Grid, periodic: bool | None = None) -> DataFrame:
    """COO weight triplets for bilinear regridding between rectilinear
    grids (destination may be a locstream — any point set with lon/lat).
    """
    if periodic is None:
        periodic = src.periodic
    if src.curvilinear:
        # 2-D mesh source: no separable axes — point-in-quad search +
        # inverse bilinear map (curvilinear.py)
        from xesmf_spark.weights.curvilinear import bilinear_weights_curvilinear

        return bilinear_weights_curvilinear(src, dst)
    src_lon = src.get_lon_axis()
    src_lat = src.get_lat_axis()
    if not dst.has_bounds:
        # point destinations (locstream): per-POINT brackets keyed by the
        # location id — a locstream has no separable axes (all points
        # share j=0), so the tensor-product path below would collapse
        # every location's lat bracket into one (frontend.py:178-184
        # allows bilinear -> locstream; weights must be per point).
        return _bilinear_points(src, dst, src_lon, src_lat, periodic)
    dst_lon = dst.get_lon_axis()
    dst_lat = dst.get_lat_axis()

    lon_br = _axis_bracket(src_lon, dst_lon, "di", periodic=periodic).withColumnRenamed(
        "k", "si"
    ).withColumnRenamed("w", "w_lon")
    lat_br = _axis_bracket(src_lat, dst_lat, "dj", periodic=False).withColumnRenamed(
        "k", "sj"
    ).withColumnRenamed("w", "w_lat")
    if periodic:
        lat_br = lat_br.unionByName(
            _pole_brackets(src_lat, dst_lat, src.n_y)
            .withColumnRenamed("k", "sj")
            .withColumnRenamed("w", "w_lat")
        )

    n_x_src, n_x_dst, n_y_src = src.n_x, dst.n_x, src.n_y
    return _tensor_product(
        lon_br, lat_br, dst_lon, src_lon, n_x_src, n_x_dst, n_y_src, periodic
    )


def _tensor_product(lon_br, lat_br, dst_lon, src_lon, n_x_src, n_x_dst, n_y_src, periodic):

    # interior tensor product: ≤4 nnz per dest cell
    interior = (
        lat_br.filter((F.col("sj") >= 0) & (F.col("sj") < n_y_src))
        .crossJoin(F.broadcast(lon_br))
        .select(
            (F.col("dj") * F.lit(n_x_dst) + F.col("di")).alias("row"),
            (F.col("sj") * F.lit(n_x_src) + F.col("si")).alias("col"),
            (F.col("w_lat") * F.col("w_lon")).alias("S"),
        )
    )
    if not periodic:
        return interior

    # pole part: virtual pole value = mean of the adjacent row (ALLAVG) —
    # lon-independent, so the dest's lon weights do not enter; but only
    # dest cells whose lon IS bracketed (always true when periodic).
    pole = lat_br.filter((F.col("sj") < 0) | (F.col("sj") >= n_y_src))
    if pole.isEmpty():
        return interior
    dst_i = dst_lon.select(F.col(dst_lon.columns[0]).alias("di"))
    src_i = src_lon.select(F.col(src_lon.columns[0]).alias("si"))
    pole_rows = (
        pole.crossJoin(F.broadcast(dst_i))
        .crossJoin(F.broadcast(src_i))
        .select(
            (F.col("dj") * F.lit(n_x_dst) + F.col("di")).alias("row"),
            (
                F.when(F.col("sj") < 0, F.lit(0)).otherwise(F.lit(n_y_src - 1)) * F.lit(n_x_src)
                + F.col("si")
            ).alias("col"),
            (F.col("w_lat") / F.lit(float(n_x_src))).alias("S"),
        )
    )
    return interior.unionByName(pole_rows)


def _bilinear_points(
    src: Grid, dst: Grid, src_lon: DataFrame, src_lat: DataFrame, periodic: bool
) -> DataFrame:
    """Bilinear weights onto a POINT destination (locstream).

    Each location gets its own lon bracket and lat bracket, both keyed by
    the location id (``row = cell_id`` directly — the locstream shape
    hack (1, n) of xesmf/frontend.py:102 makes cell_id == i). The two
    brackets combine with an EQUI-join on the id, so a point's lat
    weights can never leak to another point.

    Scale: the bracketing joins are broadcast non-equi joins of the
    point set against the tiny adjacent-center-pair axis tables
    (O(n_pts * n_axis) nested-loop with the axis side broadcast) — the
    point set itself is never shuffled or broadcast.
    """
    pts_lon = dst.df.select(F.col("cell_id").alias("pid"), F.col("lon").alias("c"))
    pts_lat = dst.df.select(F.col("cell_id").alias("pid"), F.col("lat").alias("c"))

    lon_br = _axis_bracket(src_lon, pts_lon, "pid", periodic=periodic).withColumnRenamed(
        "k", "si"
    ).withColumnRenamed("w", "w_lon")
    lat_br = _axis_bracket(src_lat, pts_lat, "pid", periodic=False).withColumnRenamed(
        "k", "sj"
    ).withColumnRenamed("w", "w_lat")
    if periodic:
        lat_br = lat_br.unionByName(
            _pole_brackets(src_lat, pts_lat, src.n_y, idx_dst="pid")
            .withColumnRenamed("k", "sj")
            .withColumnRenamed("w", "w_lat")
        )

    n_x_src, n_y_src = src.n_x, src.n_y
    interior = (
        lat_br.filter((F.col("sj") >= 0) & (F.col("sj") < n_y_src))
        .join(lon_br, "pid")
        .select(
            F.col("pid").alias("row"),
            (F.col("sj") * F.lit(n_x_src) + F.col("si")).alias("col"),
            (F.col("w_lat") * F.col("w_lon")).alias("S"),
        )
    )
    if not periodic:
        return interior

    # ALLAVG virtual-pole rows: value = mean of the adjacent source row,
    # lon-independent -> spread S = w_lat / n_x over every cell of it
    pole = lat_br.filter((F.col("sj") < 0) | (F.col("sj") >= n_y_src))
    src_i = src_lon.select(F.col(src_lon.columns[0]).alias("si"))
    pole_rows = pole.crossJoin(F.broadcast(src_i)).select(
        F.col("pid").alias("row"),
        (
            F.when(F.col("sj") < 0, F.lit(0)).otherwise(F.lit(n_y_src - 1)) * F.lit(n_x_src)
            + F.col("si")
        ).alias("col"),
        (F.col("w_lat") / F.lit(float(n_x_src))).alias("S"),
    )
    return interior.unionByName(pole_rows)
