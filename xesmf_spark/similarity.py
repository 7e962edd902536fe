"""Similarity search over embedding columns (``array<float>``).

Two physical strategies, mirroring the nearest-neighbor duality in
``weights/nearest.py`` (broadcast-exact vs bucketed-scale):

- ``cosine_topk``   — exact brute-force top-k: cross join with the pool
  broadcast, cosine as a pure Column fold (JVM), windowed rank. O(n*m)
  — the correctness baseline and the right plan when one side is small.
- ``ivf_topk``      — IVF (inverted-file) top-k: vectors are assigned
  to their nearest centroid cell; a query probes only ``n_probe``
  cells, so the candidate join is an EQUI-join on cell id. Centroids
  here are a deterministic subset of the vectors (seed ids), keeping
  the operator fully oracle-checkable; swap in k-means centroids for
  production without changing the plan shape.

Determinism contract (for the DuckDB oracle): floats are cast to
DOUBLE element-wise before any arithmetic, dot products are sequential
left-to-right folds in both engines, ordering keys round the cosine to
6 decimals and tie-break on the neighbor id.

Scale notes:
- the cosine fold is whole-stage-codegen'd — no Python in the loop;
- norms are computed ONCE per side in a projection, not per pair;
- IVF probe cost: |cells probed| * avg cell size; cell skew is the
  usual hazard — AQE skew-join handles moderate skew, re-seeding
  centroids handles pathological skew;
- at 100 TB the pool side is bucketed by cell id on disk so the
  candidate equi-join co-locates without a shuffle of the pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_ORD = 6  #: cosine rounding used in ordering + output


def _dot(a, b):
    """Sequential left-to-right dot product of two float arrays as
    DOUBLE — bit-matches DuckDB's list_sum(list_transform(...)).

    Measured note: this zip_with+aggregate fold IS the fast form — an
    unrolled 64-term element_at chain was 7x slower (the giant codegen
    expression tree defeats JIT), so don't "optimize" it that way."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Project (id, vec, norm) — norms once per vector, not per pair."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
    )


def cosine_topk(
    queries: DataFrame,
    pool: DataFrame | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector (self-join
    when ``pool`` is None; self-matches excluded). Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = with_norm(queries, id_col, vec_col).alias("q")
    p = with_norm(pool if pool is not None else queries, id_col, vec_col).alias("p")
    cos = _dot(F.col("q.v"), F.col("p.v")) / (F.col("q.nrm") * F.col("p.nrm"))
    pairs = (
        q.crossJoin(F.broadcast(p))
        .filter(F.col("q.id") != F.col("p.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("p.id").alias("neighbor_id"),
            F.round(cos, ROUND_ORD).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assignments(
    df: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid cells by
    cosine. Centroids are the vectors with ``id < n_centroids`` (a
    deterministic seed-subset codebook). Returns (id, v, nrm, cell,
    crank)."""
    vecs = with_norm(df, id_col, vec_col)
    cents = vecs.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("cell"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("id").orderBy(
        F.round(cos, ROUND_ORD).desc(), F.col("cell").asc()
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_probe)
        .select("id", "v", "nrm", "cell", "crank")
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from shared
    IVF cells (equi-join — never all-pairs), kept when cosine >=
    ``threshold``. Returns (id_a < id_b, cosine). The scale shape of
    embedding dedup: cell-join cost, exact cosine verification, and a
    scaled copy of a vector always lands in the same cell as the
    original (cosine to every centroid is scale-invariant), so true
    duplicates cannot be missed by the bucketing."""
    assign = ivf_assignments(df, n_centroids, id_col, vec_col, n_probe=n_probe)
    a = assign.select(
        "cell", F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = assign.filter(F.col("crank") == 1).select(
        "cell", F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, ROUND_ORD).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def ivf_topk(
    df: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF cells: pool vectors
    live in their single nearest cell, queries probe their ``n_probe``
    nearest cells, candidates = equi-join on cell id. Returns
    (query_id, neighbor_id, cosine, rank). Approximate: a true neighbor
    assigned to an unprobed cell is missed — the classic IVF recall
    trade; raise ``n_probe`` to trade cost for recall."""
    # one assignment pass serves both roles: pool membership is the
    # rank-1 cell, probes are the top n_probe cells (persisted — the
    # |vecs| x |centroids| window runs once)
    assign = ivf_assignments(df, n_centroids, id_col, vec_col, n_probe=n_probe).persist()
    pool = assign.filter(F.col("crank") == 1).select(
        F.col("cell"), F.col("id").alias("pid"), F.col("v").alias("pv"), F.col("nrm").alias("pnrm")
    )
    probes = assign.select(
        F.col("cell"),
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = _dot(F.col("qv"), F.col("pv")) / (F.col("qnrm") * F.col("pnrm"))
    cand = (
        probes.join(pool, "cell")
        .filter(F.col("qid") != F.col("pid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("pid").alias("neighbor_id"),
            F.round(cos, ROUND_ORD).alias("cosine"),
        )
        .distinct()  # a pair can surface via two probed cells
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
