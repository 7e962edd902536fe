"""First-order conservative remapping weights (SURVEY.md §2B-4).

Reference: ``method='conservative'`` in esmf_regrid_build
(xesmf/backend.py:242), corners required (backend.py:254-260), periodic
forced off (xesmf/frontend.py:165-167). Algorithm per Jones 1999 (cited
xesmf/data.py:30-32) with ESMF's default destination-area normalization::

    S(d, s) = area(s ∩ d) / area(d)

Spherical area of a lat-lon box = dlon_rad * (sin(lat_hi) - sin(lat_lo)),
so for RECTILINEAR grids the weight separates into two 1-D
interval-overlap fractions::

    S = [ovl_lon / dest_dlon] * [ovl_sinlat / dest_dsinlat]

Spark plan: two tiny-axis interval-overlap joins (broadcast nested-loop —
axis tables are O(n_x + n_y) rows even for a 100k x 100k-cell grid), then
one cross-combine producing the O(nnz) triplet table. The big O(n_cells)
cell tables are never joined pairwise — the axis decomposition is what
makes this scale: nnz ~ 4-9 per dest cell instead of n_in * n_out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xesmf_spark.grids import Grid


def _axis_overlap(src_ax: DataFrame, dst_ax: DataFrame, idx_src: str, idx_dst: str,
                  transform: str | None = None) -> DataFrame:
    """Interval-overlap join of two 1-D axis tables.

    Returns (idx_src, idx_dst, frac) where frac = overlap / dest_width,
    optionally measuring both in ``sin(radians(x))`` space (latitude —
    the spherical-area measure).
    """
    if transform == "sinlat":
        def m(c):
            return F.sin(F.radians(c))
    else:
        def m(c):
            return c

    s = src_ax.select(
        F.col(src_ax.columns[0]).alias(idx_src),
        m(F.col("lo")).alias("s_lo"),
        m(F.col("hi")).alias("s_hi"),
    )
    d = dst_ax.select(
        F.col(dst_ax.columns[0]).alias(idx_dst),
        m(F.col("lo")).alias("d_lo"),
        m(F.col("hi")).alias("d_hi"),
    )
    # non-equi interval join; axis tables are tiny -> broadcast NL join
    ov = s.join(
        F.broadcast(d),
        (F.col("s_lo") < F.col("d_hi")) & (F.col("s_hi") > F.col("d_lo")),
        "inner",
    )
    return ov.select(
        idx_src,
        idx_dst,
        (
            (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo"))
            / (F.col("d_hi") - F.col("d_lo"))
        ).alias("frac"),
    )


def conservative_weights(src: Grid, dst: Grid, strategy: str | None = None) -> DataFrame:
    """COO weight triplets for first-order conservative regridding.

    ``strategy=None`` auto-dispatches: the axis-decomposed plan below
    for rectilinear pairs, the general polygon-clipping builder
    (conservative_clip.py) when either mesh is curvilinear. ``"clip"``
    forces the general builder on rectilinear pairs too (differential /
    oracle checking — both compute spherical area in the same
    (radians(lon), sin(lat)) measure, so they agree exactly there).

    Unmapped destination cells simply get no rows — the apply's left
    join + coalesce(., 0.0) reproduces ``unmapped_action=IGNORE``
    (xesmf/backend.py:275-279).
    """
    if strategy is None:
        strategy = "clip" if (src.curvilinear or dst.curvilinear) else "axis"
    if strategy == "clip":
        from xesmf_spark.weights.conservative_clip import conservative_weights_clip

        return conservative_weights_clip(src, dst)
    if not src.has_bounds or not dst.has_bounds:
        # mirrors the reference's hard requirement: conservative needs
        # corner bounds (xesmf/backend.py:254-260 -> KeyError upstream)
        raise KeyError("conservative method requires cell bounds (lon_b/lat_b) on both grids")

    lon_ov = _axis_overlap(src.get_lon_axis(), dst.get_lon_axis(), "si", "di")
    lat_ov = _axis_overlap(
        src.get_lat_axis(), dst.get_lat_axis(), "sj", "dj", transform="sinlat"
    ).withColumnRenamed("frac", "frac_lat")
    lon_ov = lon_ov.withColumnRenamed("frac", "frac_lon")

    n_x_src, n_x_dst = src.n_x, dst.n_x
    w = lat_ov.crossJoin(F.broadcast(lon_ov)).select(
        (F.col("dj") * F.lit(n_x_dst) + F.col("di")).alias("row"),
        (F.col("sj") * F.lit(n_x_src) + F.col("si")).alias("col"),
        (F.col("frac_lat") * F.col("frac_lon")).alias("S"),
    )
    # threshold matches the clip builder's _MIN_S: boundary-coincident
    # intervals produce fp-dust overlaps (1e-29..1e-14 measured on the
    # bench pair — 104k of 584k rows, 18% of the weight table!) that
    # contribute nothing (< 1e-12 of a cell is sub-micrometer on Earth)
    # but bloat every downstream apply join at scale
    return w.filter(F.col("S") > 1e-12)
