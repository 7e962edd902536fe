"""Structured Streaming forms of the engine's aggregations.

The reference is batch-only (dask is lazy batch — SURVEY.md §2C), but
the engine's two core shapes both stream naturally because their state
is bounded and key-partitioned:

- ``stream_hourly_events``: the events tumbling-window aggregate under
  ``readStream`` with a watermark — late rows beyond the watermark are
  dropped, state is per (window, event_type), and the sink sees appends
  once windows close.
- ``regrid_stream``: weight application over a STREAM of field rows.
  The weights are a static DataFrame, so the join is a stream-static
  broadcast join (no stream-stream state), and the per-(window, row)
  sum is an ordinary windowed aggregation. Weights being data-independent
  (the reference's central premise, Reuse_regridder.ipynb c21-22) is
  exactly what makes online regridding a safe streaming query.

Scale notes: state size = windows-in-flight x destination cells (or
event types) — independent of stream volume; watermark bounds the
windows in flight. At 100-TB/day rates the pre-aggregation into
(window, cell) partials happens map-side before the shuffle, same as
the batch apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream over the driver's events parquet layout.
    Physical ``ts`` encoding (INT64 nanos or timestamp[us]) is absorbed
    by the xesmf_spark.tables contract: downstream sees ``ts`` as
    BIGINT epoch ns plus a TIMESTAMP ``event_ts`` for watermarking."""
    from xesmf_spark.tables import event_time_col, normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(path)
    raw = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )
    return normalize_events(raw).withColumn("event_ts", event_time_col("ts"))


def stream_hourly_events(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with late-data watermark —
    the streaming twin of queries.events_hourly."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def regrid_stream(
    field_stream: DataFrame,
    weights: DataFrame,
    dest_grid,
    time_col: str = "event_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    cell_col: str = "cell_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming weight application: stream-static broadcast join with
    the (static) weight triplets + windowed per-destination-cell sum.

    Returns (window_start, row, value) — unmapped destination cells are
    NOT zero-filled here (that needs the closed set of windows, a batch
    concept); consumers needing dense output left-join the dest grid
    per closed window downstream.
    """
    w = F.broadcast(weights)
    return (
        field_stream.withWatermark(time_col, watermark)
        .join(w, F.col(cell_col) == F.col("col"), "inner")
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("row"),
        )
        .agg(F.sum(F.col("S") * F.col(value_col)).alias(value_col))
        .select(F.col("w.start").alias("window_start"), "row", value_col)
    )


SESSION_OUT_SCHEMA = "user_id bigint, session_start bigint, session_end bigint, n_events bigint, total_value double"
SESSION_STATE_SCHEMA = "start bigint, last bigint, n bigint, v double"


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the arbitrary-state API — sessions
    cannot be expressed as a windowed aggregate because their extent
    depends on the data). State per user = the open session
    (start, last, count, value-sum); a CLOSED session row is emitted
    whenever a new event arrives more than ``gap_minutes`` after the
    previous one. Timestamps are contract BIGINT epoch nanoseconds
    (xesmf_spark.tables — exact integer arithmetic, same semantics as
    the batch queries.events_sessionize).

    State size: one small tuple per ACTIVE user — bounded by user
    cardinality, not stream volume; the open session at stream end
    stays in state (no synthetic close), matching what a perpetual
    stream means.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    gap_ns = gap_minutes * 60 * 1_000_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        ev = pd.concat(list(pdfs))
        if len(ev) == 0:
            return
        ev = ev.sort_values(ts_col)
        if state.exists:
            start, last, n, v = state.get
        else:
            start = last = None
            n, v = 0, 0.0
        (uid,) = key
        closed = []
        for ts, val in zip(ev[ts_col], ev[value_col]):
            ts = int(ts)
            if last is not None and ts - last > gap_ns:
                closed.append((uid, start, last, n, v))
                start, n, v = ts, 0, 0.0
            if start is None:
                start = ts
            last = ts
            n += 1
            v += float(val)
        state.update((start, last, n, v))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drive a streaming query to completion over the currently
    available input (availableNow trigger) into an in-memory sink and
    return the result as a DataFrame — the test/verification harness
    for the streaming operators."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        # stop the still-running query and fail LOUDLY: returning the
        # partially-populated memory table would make parity tests
        # compare against an incomplete sink
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not finish within "
            f"{timeout_sec}s (availableNow run incomplete)"
        )
    spark = stream_df.sparkSession
    return spark.table(query_name)


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "event_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAMING exact deduplication of a document stream — the online
    form of ``pipeline.exact_dedup``: each incoming document's
    normalized-content digest is checked against the dedup state and
    only the FIRST arrival per digest is emitted.

    Built on ``dropDuplicatesWithinWatermark`` so the dedup state is
    WATERMARK-BOUNDED: a digest's state entry is dropped once the
    watermark passes its event time, which is what makes perpetual
    ingestion feasible — state size tracks the dedup horizon, not the
    stream's full history (an unbounded ``dropDuplicates`` would OOM a
    perpetual ingest; the horizon is the documented trade: re-arrivals
    farther apart than the watermark pass through).

    At 100-TB/day ingest the digest is 16 bytes per in-horizon doc and
    the state store is key-partitioned by digest — the same shuffle key
    the batch exact-dedup groupBy uses.
    """
    from xesmf_spark.pipeline import normalize_text

    digest = F.md5(F.encode(normalize_text(F.col(text_col)), "utf-8")).alias(
        "content_key"
    )
    return (
        docs.select("*", digest)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_key"])
    )
