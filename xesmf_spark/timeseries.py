"""Time-series feature operators over continuous-aggregate rollups:
exponentially-weighted moving averages and robust (median/MAD) anomaly
flagging.

Beyond-reference scope.  Both operators run on ROLLUP STATE (the
O(buckets x keys) table :func:`xesmf_spark.relational.rollup_delta`
maintains), never on raw events — the discipline that makes them free
at 100 TB: the heavy aggregation already happened map-side in the
rollup; everything here is state-size joins and windows.

Exactness: EWMA uses power-of-two integer weights with a fixed
denominator (missing buckets contribute zero), floored to micro-units
— bit-exact across engines.  MAD uses interpolated medians of
integers, whose values are exact binary fractions (halves/quarters),
so double comparisons are still engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 1_000_000


def ewma_rollup(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    window: int = 8,
) -> DataFrame:
    """EWMA with weight ``2^(window-1-gap)`` over the trailing
    ``window`` buckets (gap = 0 is the bucket itself), missing buckets
    counting as zero, normalized by the fixed ``2^window - 1``:

        ewma_micro = FLOOR(1e6 * sum(2^(w-1-gap) * x[t-gap])
                           / (2^w - 1))

    A lag-distance-dependent weight is the shape ROWS/RANGE window
    frames cannot express; instead each state row SCATTERS its value
    forward onto the ``window`` buckets it influences (one in-row
    explode of the gap sequence), a map-side-combinable SUM gathers
    per target bucket, and an inner join keeps only buckets that exist
    in the rollup.  All joins/aggs are on the state table — cost is
    O(state x window), independent of raw volume.

    Output: the rollup's keys + bucket + ``ewma_micro`` (BIGINT)."""
    if not 1 <= window <= 62:
        # 2^(window-1) must fit a BIGINT weight; and shiftleft must run
        # on a LONG literal — an INT 1 would wrap the shift mod 32
        raise ValueError(f"window must be in [1, 62], got {window}")
    denom = (1 << window) - 1
    targets = rollup.select(*key_cols, bucket_col).distinct()
    contribs = (
        rollup.select(
            *key_cols,
            F.col(bucket_col),
            F.col(val_col).cast("long").alias("__x"),
            F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__gap"),
        )
        .select(
            *key_cols,
            (F.col(bucket_col) + F.col("__gap")).alias(bucket_col),
            (
                F.expr(f"shiftleft(1L, {window - 1} - __gap)")
                * F.col("__x")
            ).alias("__w"),
        )
        .groupBy(*key_cols, bucket_col)
        .agg(F.sum("__w").alias("__num"))
    )
    return targets.join(contribs, [*key_cols, bucket_col]).select(
        *key_cols,
        bucket_col,
        F.expr(f"({M}L * __num) div {denom}L").alias("ewma_micro"),
    )


def mad_anomalies(
    rollup: DataFrame,
    key_cols: list[str],
    val_col: str,
    n_sigmas: int = 3,
) -> DataFrame:
    """Robust anomaly flags per key: a bucket is anomalous when
    ``|x - median| > n_sigmas * MAD`` with MAD = median of absolute
    deviations.  Median/MAD (not mean/stddev) so a single spike cannot
    drag the threshold after itself — the standard robust detector.

    Exactness: interpolated medians of BIGINTs land on halves, MADs on
    quarters — exact binary fractions, so the double comparison is
    engine-deterministic (mirrored by the oracle verbatim).

    Scale shape: two grouped medians + two state-keyed joins, all on
    the rollup table; Spark plans percentile on the state, never the
    raw stream."""
    x = F.col(val_col).cast("double")
    meds = rollup.groupBy(*key_cols).agg(F.median(x).alias("__med"))
    with_med = rollup.join(meds, key_cols)
    mads = (
        with_med.groupBy(*key_cols)
        .agg(F.median(F.abs(x - F.col("__med"))).alias("__mad"))
    )
    return (
        with_med.join(mads, key_cols)
        .select(
            *rollup.columns,
            F.col("__med").alias("med"),
            F.col("__mad").alias("mad"),
            (F.abs(x - F.col("__med")) > F.lit(float(n_sigmas)) * F.col("__mad")).alias(
                "is_anomaly"
            ),
        )
    )
