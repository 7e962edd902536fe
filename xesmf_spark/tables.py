"""Defensive schema contract for the driver's parquet tables.

The testdata layout has drifted between rounds (round 3: ``events.ts``
changed from INT64 TIMESTAMP(NANOS) to ``timestamp[us]`` →
TIMESTAMP_NTZ), and a silent dtype drift took down every query that
touched the column.  This module is the single choke point where each
table's physical encoding is normalized to the LOGICAL schema the rest
of the engine is written against, so the next drift degrades one cast
here instead of a whole round.

Logical contracts (what downstream code may assume):

- ``events``:   ``ts`` is BIGINT epoch **nanoseconds** (UTC).  All
  sessionize/window arithmetic is exact integer math on it, matching
  the DuckDB oracle's ``EPOCH_NS(ts)``.  Accepted physical encodings:
  INT64 nanos (pre-r3 layout, read via
  ``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP_NTZ (current
  ``timestamp[us]`` layout), TIMESTAMP.
- all other tables: used as-written.

The NTZ→epoch conversion uses ``timestampdiff(MICROSECOND, epoch, ts)``
which is closed-form on the NTZ wall-clock value — **independent of
``spark.sql.session.timeZone``** — exactly matching DuckDB's
``EPOCH_NS`` on a naive timestamp.  (``unix_micros`` / ``cast`` routes
go through the session zone and would silently skew on a non-UTC
driver.)

Scale note: every normalization here is a stateless projection fused
into the scan by whole-stage codegen — zero extra shuffle or pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: micros since epoch from a wall-clock (NTZ) value, tz-independent
_EPOCH_US_NTZ = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"


def epoch_ns_col(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-nanoseconds BIGINT for ``col`` under any accepted physical
    encoding (INT64-nanos passthrough; TIMESTAMP/TIMESTAMP_NTZ via the
    tz-independent wall-clock diff — micros precision ×1000, matching
    the parquet ``timestamp[us]`` payload with no precision loss)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.col(col)
    if isinstance(dt, T.TimestampType):
        # instant-typed (isAdjustedToUTC) value: unix_micros is defined on
        # the instant itself, independent of spark.sql.session.timeZone.
        # (Casting to NTZ first would bake in the session zone's wall
        # clock and skew the epoch on non-UTC drivers.)
        return F.unix_micros(F.col(col)) * F.lit(1000)
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(_EPOCH_US_NTZ.format(c=col)) * F.lit(1000)
    raise TypeError(
        f"events.{col}: expected BIGINT nanos or TIMESTAMP[_NTZ], got {dt.simpleString()} "
        "(testdata schema drift — extend xesmf_spark.tables)"
    )


def normalize_events(df: DataFrame, col: str = "ts") -> DataFrame:
    """Rewrite ``col`` to the logical contract (BIGINT epoch ns)."""
    return df.withColumn(col, epoch_ns_col(df, col).cast("long"))


def event_time_col(col: str = "ts") -> Column:
    """TIMESTAMP event-time from contract nanos (for watermarks/windows);
    built from epoch micros so it is deterministic across session zones.

    Integer ``div`` — not ``/`` + cast: epoch-ns values (~1.7e18) exceed
    2^53, so a double division rounds by up to 256 ns and misplaces
    ~1.6% of µs-grain events by one microsecond (enough to push an
    on-the-boundary event into the previous window)."""
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table and apply its normalization."""
    if name == "events":
        # pre-r3 layout wrote INT64 TIMESTAMP(NANOS), which the
        # vectorized reader rejects outright unless surfaced as BIGINT;
        # a no-op for the current timestamp[us] files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    return df
