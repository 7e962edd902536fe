"""Nearest-neighbor regridding weights (SURVEY.md §2B-2).

Reference: ``method='nearest_s2d'`` / ``'nearest_d2s'``
(xesmf/backend.py:244-245).

- ``nearest_s2d``: each DESTINATION point takes the value of its nearest
  source point (S=1, one triplet per dest cell).
- ``nearest_d2s``: each SOURCE point is assigned to its nearest
  destination; weights ACCUMULATE (the pile-up behavior shown in
  doc/notebooks/Compare_algorithms.ipynb cells 16, 20) — so a dest cell
  receiving k sources sums k values.

Distance is 3-D chord distance on the unit sphere (the reference's math
"happens in 3-D Cartesian", xesmf/backend.py:44-45) — monotone in
great-circle distance and naturally periodic in longitude.

Two physical strategies:
- ``strategy='broadcast'``: broadcast the smaller point set and
  cross-join — exact, no shuffle of the big side, right whenever one
  side fits in memory (grids up to ~10^6 cells).
- ``strategy='bucketed'``: spatial-bin equi-join (coarse lat/lon bins,
  3x3 neighborhood via exploded offsets, longitude wraps modulo the bin
  count) with a brute-force fallback pass for points whose neighborhood
  is empty. This is the 100-TB path: the candidate join is an EQUI-join
  Catalyst can shuffle-partition by bin, cost O(n * candidates-per-bin)
  instead of O(n_src * n_dst).

Tie-breaking: ``ORDER BY round(dist2, 9), point_id`` — rounding makes
exact geometric ties (common on symmetric synthetic grids) break on the
deterministic id in every engine, so Spark and the DuckDB oracle agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from xesmf_spark.grids import Grid

#: brute-force is fine (and faster) below this many points on the
#: broadcast side; above it the bucketed equi-join path takes over.
BROADCAST_LIMIT = 2_000_000


def _points(g: Grid | DataFrame, prefix: str) -> DataFrame:
    df = g.df if isinstance(g, Grid) else g
    return df.select(
        F.col("cell_id").alias(f"{prefix}_id"),
        F.radians("lon").alias(f"{prefix}_lon"),
        F.radians("lat").alias(f"{prefix}_lat"),
    )


def _dist2(p: str, q: str):
    """Squared 3-D chord distance between unit-sphere points (radians)."""
    return (
        F.lit(2.0)
        - F.lit(2.0)
        * (
            F.cos(F.col(f"{p}_lat")) * F.cos(F.col(f"{q}_lat"))
            * F.cos(F.col(f"{p}_lon") - F.col(f"{q}_lon"))
            + F.sin(F.col(f"{p}_lat")) * F.sin(F.col(f"{q}_lat"))
        )
    )


def _argmin_join(need: DataFrame, pool: DataFrame, strategy: str, bin_deg: float) -> DataFrame:
    """For each point in ``need`` (n_id, n_lon, n_lat — radians), find the
    nearest point in ``pool`` (p_id, p_lon, p_lat). Returns (n_id, p_id).
    """
    if strategy == "broadcast":
        cand = need.crossJoin(F.broadcast(pool))
        return _pick_nearest(cand)

    # bucketed: equi-join on coarse spatial bins, 3x3 neighborhood
    nbins_lon = max(1, int(round(360.0 / bin_deg)))
    binned_pool = pool.withColumn(
        "blat", F.floor((F.degrees("p_lat") + F.lit(90.0)) / F.lit(bin_deg)).cast("int")
    ).withColumn(
        "blon",
        (
            F.floor((F.degrees("p_lon") + F.lit(180.0)) / F.lit(bin_deg)).cast("int")
            % F.lit(nbins_lon)
        ),
    )
    offs = F.explode(
        F.array(*[F.struct(F.lit(a).alias("da"), F.lit(b).alias("db")) for a in (-1, 0, 1) for b in (-1, 0, 1)])
    ).alias("off")
    binned_need = (
        need.withColumn(
            "blat0", F.floor((F.degrees("n_lat") + F.lit(90.0)) / F.lit(bin_deg)).cast("int")
        )
        .withColumn(
            "blon0",
            F.floor((F.degrees("n_lon") + F.lit(180.0)) / F.lit(bin_deg)).cast("int"),
        )
        .select("*", offs)
        .select(
            "n_id",
            "n_lon",
            "n_lat",
            (F.col("blat0") + F.col("off.da")).alias("blat"),
            (((F.col("blon0") + F.col("off.db")) % F.lit(nbins_lon) + F.lit(nbins_lon)) % F.lit(nbins_lon)).alias(
                "blon"
            ),
        )
    )
    cand = binned_need.join(binned_pool, ["blat", "blon"], "inner").drop("blat", "blon")
    hit = _pick_nearest(cand)
    # fallback: points whose 3x3 neighborhood was empty (sparse pool /
    # polar bins) go through the exact broadcast pass — rare by design.
    missed = need.join(hit.select("n_id"), "n_id", "left_anti")
    rescue = _pick_nearest(missed.crossJoin(F.broadcast(pool)))
    return hit.unionByName(rescue)


def _pick_nearest(cand: DataFrame) -> DataFrame:
    d2 = _dist2("n", "p")
    win = Window.partitionBy("n_id").orderBy(F.round(d2, 9).asc(), F.col("p_id").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("n_id", "p_id")
    )


def nearest_weights(
    src: Grid,
    dst: Grid,
    direction: str = "s2d",
    strategy: str = "auto",
    bin_deg: float | None = None,
) -> DataFrame:
    """COO triplets for nearest_s2d / nearest_d2s. S is always 1.0;
    d2s accumulation happens naturally in the apply's group-by-sum.
    """
    sp = _points(src, "s")
    dp = _points(dst, "d")

    if strategy == "auto":
        pool_n = src.n_cells if direction == "s2d" else dst.n_cells
        strategy = "broadcast" if pool_n <= BROADCAST_LIMIT else "bucketed"
    if bin_deg is None:
        # heuristic: bins ~2 cells wide on the pool grid so the true
        # nearest is inside the 3x3 neighborhood for quasi-uniform grids
        pool = src if direction == "s2d" else dst
        bin_deg = max(1.0, 2.0 * 360.0 / max(pool.n_x, 1))

    if direction == "s2d":
        need = dp.select(F.col("d_id").alias("n_id"), F.col("d_lon").alias("n_lon"), F.col("d_lat").alias("n_lat"))
        pool = sp.select(F.col("s_id").alias("p_id"), F.col("s_lon").alias("p_lon"), F.col("s_lat").alias("p_lat"))
        pairs = _argmin_join(need, pool, strategy, bin_deg)
        return pairs.select(
            F.col("n_id").alias("row"), F.col("p_id").alias("col"), F.lit(1.0).alias("S")
        )
    elif direction == "d2s":
        need = sp.select(F.col("s_id").alias("n_id"), F.col("s_lon").alias("n_lon"), F.col("s_lat").alias("n_lat"))
        pool = dp.select(F.col("d_id").alias("p_id"), F.col("d_lon").alias("p_lon"), F.col("d_lat").alias("p_lat"))
        pairs = _argmin_join(need, pool, strategy, bin_deg)
        return pairs.select(
            F.col("p_id").alias("row"), F.col("n_id").alias("col"), F.lit(1.0).alias("S")
        )
    raise ValueError(f"direction must be 's2d' or 'd2s', got {direction!r}")
