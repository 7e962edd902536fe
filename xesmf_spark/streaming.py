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

import os
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


def stream_sliding_events(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING (hopping) windowed aggregate with late-data watermark —
    the overlapping-window twin of :func:`stream_hourly_events`
    (tumbling): every event lands in ``window``/``slide`` windows
    (2 here), the moving-average shape dashboards ask for.  Spark
    maintains one state row per open (window, key); the watermark
    bounds open windows, so state is (window span / slide) × keys —
    constant per key at any input volume."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide).alias("w"), "event_type")
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


#: event_type / marker value identifying flush-sentinel rows — filtered
#: from query output by the callers that stage them
FLUSH_MARKER = "__flush__"


def stage_flush_sentinel(
    src_dir: str,
    offset_ns: int,
    ts_col: str = "ts",
    user_col: str | None = None,
    overrides: dict[str, object] | None = None,
) -> None:
    """Write a far-future sentinel parquet file into a (staged, writable)
    file-stream source directory so a finite availableNow run FLUSHES its
    final windows/state.

    Append-mode watermarked aggregations hold back every window still
    inside the watermark horizon when the input ends — the stream's
    answer is a prefix of the batch answer. A sentinel event at
    ``max(ts) + offset_ns`` advances the final no-data micro-batch's
    watermark past every real window, closing them all, which is exactly
    the emit-on-close finalize a finite input wants. With ``user_col``,
    one sentinel per distinct user is staged instead (the arbitrary-state
    sessionizer closes sessions per key, so each key needs its own
    later-than-gap event; the sentinel's own opened session stays in
    state and is never emitted).

    The sentinel file is written once (idempotent re-stage) with the SAME
    physical arrow schema as the source files, and its later mtime sorts
    it into the final micro-batch. Callers filter sentinel rows from the
    output via ``overrides`` markers (e.g. event_type=FLUSH_MARKER).
    """
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    out_path = os.path.join(src_dir, "zz-flush-sentinel.parquet")
    if os.path.exists(out_path):
        return
    files = sorted(
        f
        for f in glob.glob(os.path.join(src_dir, "*.parquet"))
        if not f.endswith("zz-flush-sentinel.parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files to flush in {src_dir}")

    cols = [ts_col] + ([user_col] if user_col else [])
    stats = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
    ts_type = stats.schema.field(ts_col).type
    if pa.types.is_integer(ts_type):
        # contract BIGINT epoch ns — passthrough
        max_raw = max(c.as_py() for c in stats[ts_col] if c.is_valid)
        sent_raw, out_ts_type = max_raw + offset_ns, ts_type
    elif pa.types.is_timestamp(ts_type):
        # ALWAYS write the sentinel as timestamp[us]: Spark reads INT64
        # TIMESTAMP_MICROS as TIMESTAMP under every config, whereas a
        # nanos sentinel would read back as LONG when the session's
        # legacy nanosAsLong flag is on (set by the events contract)
        to_us = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[ts_type.unit]
        raw = max(c.value for c in stats[ts_col] if c.is_valid)
        max_us = raw // 1000 if to_us is None else raw * to_us
        sent_raw = max_us + max(offset_ns // 1_000, 1)
        out_ts_type = pa.timestamp("us", tz=ts_type.tz)
    else:
        raise TypeError(f"{ts_col}: unsupported sentinel ts type {ts_type}")

    users = (
        sorted(stats[user_col].unique().to_pylist()) if user_col else [None]
    )
    n = len(users)

    # full-schema template: first row of the first NON-EMPTY file
    # (Spark writes can emit zero-row part files)
    first = schema = None
    for f in files:
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows > 0:
            first = pa.Table.from_batches([next(pf.iter_batches(batch_size=1))])
            schema = pf.schema_arrow
            break
    if first is None:
        raise FileNotFoundError(f"all parquet files in {src_dir} are empty")
    overrides = overrides or {}
    idx = schema.get_field_index(ts_col)
    schema = schema.set(
        idx, pa.field(ts_col, out_ts_type, schema.field(idx).nullable)
    )
    arrays = []
    for field in schema:
        if field.name == ts_col:
            arrays.append(pa.array([sent_raw] * n).cast(field.type))
        elif user_col is not None and field.name == user_col:
            arrays.append(pa.array(users).cast(field.type))
        elif field.name in overrides:
            arrays.append(pa.array([overrides[field.name]] * n).cast(field.type))
        else:
            tmpl = first.column(field.name)[0].as_py()
            arrays.append(pa.array([tmpl] * n, type=field.type))
    pq.write_table(pa.table(arrays, schema=schema), out_path)


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


def _committed_versions(state_dir: str) -> list[str]:
    """Version dirs under ``state_dir`` that finished publishing. A
    version is COMMITTED only when its directory holds the parquet
    committer's ``_SUCCESS`` marker; :func:`rollup_stream` additionally
    stages every write in a dot-prefixed temp dir and renames it into
    place (atomic on POSIX), so readers can never observe a
    half-written newest version — the torn-read hazard from the r7
    review. Uncommitted dirs (crash mid-write, or a raw copy) are
    simply invisible until the batch replays."""
    import re

    if not os.path.isdir(state_dir):
        return []
    return sorted(
        (
            e
            for e in os.listdir(state_dir)
            if re.fullmatch(r"v\d+", e)
            and os.path.exists(os.path.join(state_dir, e, "_SUCCESS"))
        ),
        key=lambda e: int(e[1:]),
    )


def latest_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Read the newest COMMITTED rollup-state version under
    ``state_dir`` (written by :func:`rollup_stream`), or None if no
    committed state exists yet."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, vs[-1]))


def _state_before(spark: SparkSession, state_dir: str, batch_id: int) -> DataFrame | None:
    """The newest state version written by a batch STRICTLY BEFORE
    ``batch_id`` — the replay-safe predecessor: foreachBatch is
    at-least-once, so a replayed batch must NOT see the version it
    wrote itself on the failed attempt (merging onto it would
    double-count, and overwriting a directory the lazy plan reads
    from is rejected by Spark anyway). Only COMMITTED versions count —
    a torn newest version from a crash is skipped, not merged."""
    vs = [e for e in _committed_versions(state_dir) if int(e[1:]) < batch_id]
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, vs[-1]))


def _publish_version(df: DataFrame, state_dir: str, batch_id: int) -> None:
    """Crash-atomic versioned-state publish (shared by the streaming
    maintenance loops): stage the parquet job in a dot-prefixed temp
    dir (invisible to the ``v\\d+`` version regex), verify the
    committer's ``_SUCCESS`` marker, then one POSIX ``os.rename`` into
    ``v{batch_id}`` — readers (:func:`latest_rollup_state`,
    :func:`_state_before`) gate on _SUCCESS inside committed dirs, so a
    crash at ANY point leaves only committed versions visible and a
    replayed batch republishes idempotently. The last two committed
    versions are retained (a replay's predecessor must survive)."""
    import shutil

    final_dir = os.path.join(state_dir, f"v{batch_id:09d}")
    tmp_dir = os.path.join(state_dir, f".staging_v{batch_id:09d}")
    shutil.rmtree(tmp_dir, ignore_errors=True)  # debris from a replay
    df.write.mode("overwrite").parquet(tmp_dir)
    if not os.path.exists(os.path.join(tmp_dir, "_SUCCESS")):
        raise RuntimeError(
            f"parquet job for state v{batch_id} left no _SUCCESS "
            f"marker in {tmp_dir}; refusing to publish an unverified state"
        )
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp_dir, final_dir)
    for stale in _committed_versions(state_dir)[:-2]:
        shutil.rmtree(os.path.join(state_dir, stale), ignore_errors=True)


def rollup_stream(
    events: DataFrame,
    state_dir: str,
    bucket_ns: int,
    keys: Sequence[str],
    agg_exprs: dict,
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
    merge: dict[str, str] | None = None,
    merge_keys: list[str] | None = None,
) -> DataFrame:
    """STREAMING continuous-aggregate maintenance — the refresh loop of
    a hypertable rollup under Structured Streaming: every micro-batch is
    partial-aggregated (``relational.rollup_delta``) and merged into the
    persistent rollup state (``relational.merge_rollups``) inside
    ``foreachBatch``, then the state is re-published as a new immutable
    version directory. Drives the stream to completion (availableNow)
    and returns the FINAL state as a batch DataFrame.

    Why foreachBatch and not a built-in streaming agg: the rollup must
    live OUTSIDE the stream (queryable by anyone, survivable across
    stream restarts via the checkpoint), and its merge must stay exact —
    all ``agg_exprs`` must be sum-mergeable integer partials, so
    N-batch maintenance is bit-identical to a from-scratch batch
    aggregate regardless of how the input was sliced into batches.

    ``merge`` (per-column min/max monoids) and ``merge_keys`` (explicit
    group keys for numeric-keyed rollups) forward to
    :func:`relational.merge_rollups` — without them min/max partials or
    numeric keys would be silently summed by the default.

    Scale/safety shape: each refresh aggregates ONLY the new batch and
    merges against rollup-sized state (O(buckets x keys), never event
    volume). State versions are immutable dirs ``v{batch_id}``, and a
    batch always merges onto the newest version written by a STRICTLY
    EARLIER batch (:func:`_state_before`): foreachBatch is
    at-least-once, so a replayed batch republishes its own failed
    ``v{batch_id}`` idempotently instead of double-counting it. The
    PUBLISH itself is crash-atomic: each version is staged into a
    dot-prefixed temp dir (invisible to the version regex), verified
    against the parquet committer's ``_SUCCESS`` marker, and
    ``os.rename``d into place — a single atomic filesystem op on
    POSIX — so :func:`latest_rollup_state` can never read a torn
    newest version (r7 review hazard); a crash at any point leaves
    only committed versions visible and the replayed batch cleans up
    its own debris. The last two committed versions are retained (the
    replayed batch's predecessor must survive) and older versions
    pruned; production would use a transactional table format.
    """
    from xesmf_spark.relational import merge_rollups, rollup_delta

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        delta = rollup_delta(
            batch_df, bucket_ns, list(keys), ts_col=ts_col, agg_exprs=dict(agg_exprs)
        )
        prev = _state_before(batch_df.sparkSession, state_dir, batch_id)
        merged = (
            merge_rollups(prev, delta, keys=merge_keys, merge=merge)
            if prev is not None
            else delta
        )
        _publish_version(merged, state_dir, batch_id)

    q = (
        events.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir or state_dir + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"rollup_stream did not finish within {timeout_sec}s "
            "(availableNow run incomplete)"
        )
    final = latest_rollup_state(events.sparkSession, state_dir)
    if final is None:
        raise RuntimeError(f"rollup_stream produced no state under {state_dir}")
    return final


def heavy_hitters_stream(
    df: DataFrame,
    state_dir: str,
    to_tokens,
    capacity: int = 1024,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """STREAMING heavy-hitters maintenance — the online form of
    :func:`pipeline.heavy_hitters`: each micro-batch is summarized into
    a bounded Misra-Gries sketch and MERGED into the persistent summary
    state inside ``foreachBatch`` (versioned parquet state, same
    machinery as :func:`rollup_stream`). Returns the final merged
    summary: (token, est) rows plus the NULL-token ``delta_total`` row.

    Why this composes correctly: MG summaries are MERGEABLE — counter
    mass and trim mass are both additive, and re-trimming the union
    back to ``capacity`` (subtract the (capacity+1)-th largest, keep
    positive, add the subtracted value to delta) preserves the
    guarantees est <= true and true - est <= delta_total REGARDLESS of
    how the stream was sliced into batches (Agarwal et al., mergeable
    summaries). Replay safety is inherited: a batch merges onto the
    newest state from a STRICTLY EARLIER batch (:func:`_state_before`)
    and republishes its own version idempotently, so at-least-once
    foreachBatch delivery cannot double-count a batch's tokens.

    ``to_tokens`` maps a batch DataFrame to a single-column ``token``
    frame (tokenization happens per batch, map-side). State is
    O(capacity) rows FOREVER — the property that makes a perpetual
    top-k over an unbounded key stream feasible where exact streaming
    counts would grow with distinct keys. The re-trim window runs
    unpartitioned BY CONSTRUCTION over <= 2*capacity+1 state rows,
    never data volume.
    """
    from xesmf_spark.pipeline import heavy_hitters

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = heavy_hitters(to_tokens(batch_df), "token", capacity)
        prev = _state_before(spark, state_dir, batch_id)
        merged = (
            prev.unionByName(delta).groupBy("token").agg(
                F.sum("est").cast("long").alias("est")
            )
            if prev is not None
            else delta
        )
        # re-trim the union to <= capacity counters: subtract the
        # (capacity+1)-th largest counter value from all, fold it into
        # the NULL-token delta row. The merged summary is
        # <= 2*capacity + 2 rows BY CONSTRUCTION, so collect it ONCE
        # and trim driver-side — expressing the trim as more plan on
        # top of `merged` would re-execute the batch's full MG
        # summarization for every materialization (the cut lookup,
        # the delta sum, and the publish each ran it before this fix)
        rows = merged.collect()
        counters = sorted(
            ((int(r["est"]), r["token"]) for r in rows if r["token"] is not None),
            key=lambda t: (-t[0], t[1]),
        )
        old_delta = sum(int(r["est"]) for r in rows if r["token"] is None)
        v = counters[capacity][0] if len(counters) > capacity else 0
        final = spark.createDataFrame(
            [(tok, est - v) for est, tok in counters if est > v]
            + [(None, old_delta + v)],
            "token string, est long",
        )
        _publish_version(final, state_dir, batch_id)

    q = (
        df.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir or state_dir + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"heavy_hitters_stream did not finish within {timeout_sec}s "
            "(availableNow run incomplete)"
        )
    final = latest_rollup_state(df.sparkSession, state_dir)
    if final is None:
        raise RuntimeError(f"heavy_hitters_stream produced no state under {state_dir}")
    return final


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner interval join: pairs with matching ``on`` key
    and ``left_ts + lower_sec <= right_ts <= left_ts + upper_sec``
    (event-time TIMESTAMP columns; column names must not collide apart
    from the key, which must be named the same on both sides).

    Inner stream-stream joins emit each match as soon as both rows have
    arrived, so a finite availableNow run produces EXACTLY the batch
    range join — no flush sentinel needed (watermarks here only bound
    the buffered state: each side retains rows until the other side's
    watermark passes the join horizon, so state tracks the horizon, not
    stream history — the property that makes this viable perpetually).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark).withColumnRenamed(on, f"__r_{on}")
    cond = (
        (F.col(on) == F.col(f"__r_{on}"))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_sec} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_sec} SECOND"))
    )
    return l.join(r, cond, "inner").drop(f"__r_{on}")


def interval_join_stream_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM **LEFT OUTER** interval join — the other half of the
    standard streaming-join surface (the inner form above): every left
    row is emitted, with right columns NULL when no matching right row
    ever arrives.

    Semantics on an unbounded stream: a left row cannot be declared
    unmatched the moment it arrives — a matching right row may still be
    in flight. Spark therefore buffers the left row and emits the
    null-extended result only once the (global) watermark passes the
    row's join horizon ``left_ts + upper_sec``: at that point no
    admissible right row can still arrive, so "unmatched" is final.
    This is exactly watermark-bounded state again — each side holds only
    rows inside the horizon, same as the inner join, so perpetual
    ingestion stays viable.

    Finite-run discipline (how the oracle query drives this): the
    null-extended rows only flush if the watermark actually advances
    past the last real left row's horizon — which a finite input does
    NOT do on its own (the watermark freezes at max(ts) - delay, leaving
    the final horizon's unmatched rows stuck in state — the same prefix
    trap as append-mode aggregation). The caller stages a far-future
    flush sentinel into BOTH input filters, advancing both watermark
    nodes (the query watermark is the MIN across inputs) so every real
    left row evicts; sentinel rows are filtered from the output by their
    marker. Spark runs the required no-data micro-batch after the last
    data batch (shouldRunAnotherBatch: eviction work pending), so an
    availableNow run emits the complete outer result before stopping.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark).withColumnRenamed(on, f"__r_{on}")
    cond = (
        (F.col(on) == F.col(f"__r_{on}"))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_sec} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_sec} SECOND"))
    )
    return l.join(r, cond, "leftOuter").drop(f"__r_{on}")


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


def cdc_apply_stream(
    changes: DataFrame,
    state_dir: str,
    key_cols: Sequence[str],
    ts_col: str,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
    op_col: str | None = None,
) -> DataFrame:
    """STREAMING CDC apply: maintain a last-write-wins key-value table
    from an unbounded change stream — the online sibling of
    :func:`xesmf_spark.relational.merge_upsert` (batch Type-1 upsert)
    and :func:`xesmf_spark.relational.scd2_build` (batch history).
    Each micro-batch is reduced to its newest row per key, then merged
    onto the persistent state inside ``foreachBatch`` (versioned
    parquet, the :func:`rollup_stream` machinery: crash-atomic
    :func:`_publish_version`, replay-safe :func:`_state_before` so
    at-least-once redelivery cannot regress a key to an older value —
    LWW merge is idempotent and commutative ACROSS batches only when
    each batch merges onto a strictly-earlier state).

    Determinism contract: (key, ``ts_col``) unique — same-timestamp
    conflicts have no defined winner (pre-aggregate them away, as
    :func:`~xesmf_spark.relational.scd2_build` requires).

    With ``op_col`` set, ``changes`` carries a change-op column
    (``'upsert'``/``'delete'``) and tombstones delete their key from
    the LIVE table. Tombstone rows stay IN the persisted state (they
    must keep winning LWW against older upserts that may arrive in a
    later batch — dropping them would resurrect the key); only the
    RETURNED live view filters them out and drops ``op_col``.
    Tombstone retention/compaction is a deployment policy (state is
    O(live keys + tombstoned keys)).

    Scale shape: the per-batch reduce is one window over the BATCH
    (delta-sized); the merge is a window over state ∪ delta — state
    is O(live keys), the dimension being maintained, never raw change
    volume. Returns the final state DataFrame."""
    from pyspark.sql import Window

    keys = list(key_cols)

    def _lww(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = _lww(batch_df)
        prev = _state_before(spark, state_dir, batch_id)
        merged = delta if prev is None else _lww(prev.unionByName(delta))
        _publish_version(merged, state_dir, batch_id)

    q = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir or state_dir + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"cdc_apply_stream did not finish within {timeout_sec}s"
        )
    final = latest_rollup_state(changes.sparkSession, state_dir)
    if final is None:
        raise RuntimeError(f"cdc_apply_stream produced no state under {state_dir}")
    if op_col is not None:
        # NULL-safe: a NULL op is an upsert; plain != would NULL out
        # the predicate and drop the row from the live view.
        final = final.filter(~F.col(op_col).eqNullSafe("delete")).drop(op_col)
    return final


def snapshot_ingest_stream(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> DataFrame:
    """EXACTLY-ONCE streaming ingestion into a snapshot-versioned table
    (:func:`xesmf_spark.sources.snapshot_commit`): every micro-batch is
    appended as one table commit TAGGED with its batch id.  foreachBatch
    is at-least-once, so a replayed batch re-enters ``snapshot_commit``
    — the tag lookup (checked before committing AND after a manifest
    os.link race) makes the replay a no-op, so each batch's rows land
    exactly once at the table level; the failed attempt's staged parts
    remain as orphans, invisible under the manifest-scoped read rule.
    This is the lakehouse streaming-ingest kernel: Structured Streaming
    provides ordering + replay, the manifest chain provides atomic
    visibility + time travel over the growing table.

    Returns the final table snapshot (latest committed version)."""
    from xesmf_spark.sources import snapshot_commit, snapshot_read

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        snapshot_commit(
            batch_df, table_dir, mode="append", tag=f"batch-{batch_id}"
        )

    q = (
        df.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"snapshot_ingest_stream did not finish within {timeout_sec}s"
        )
    return snapshot_read(df.sparkSession, table_dir)


def psi_drift_stream(
    new_stream: DataFrame,
    base: DataFrame,
    val_col: str,
    lo: int,
    width: int,
    nbins: int,
    state_dir: str,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """STREAMING drift monitor — PSI of an arriving sample against a
    pinned baseline, maintained incrementally: every micro-batch is
    histogram-counted (``quality.histogram_rollup``, the caller-pinned
    equi-width bins that make the metric mergeable) and merged into
    the persistent versioned histogram state inside ``foreachBatch``
    (same at-least-once discipline as :func:`rollup_stream`: merge
    onto the newest STRICTLY-EARLIER version, republish your own
    batch id idempotently, crash-atomic rename publish). Drives the
    stream to completion (availableNow) and returns the final PSI
    frame (``quality.psi_from_histograms``) — bit-identical to the
    batch :func:`~xesmf_spark.quality.psi_drift` on the same data,
    because histogram counts are sum-mergeable integer partials.

    Scale shape: per batch one map-side-combinable count keyed on
    ``nbins`` bins + a merge against O(nbins) state — never event
    volume; the PSI tail is the usual nbins-row frame + two 1-row
    broadcasts."""
    from xesmf_spark.quality import histogram_rollup, psi_from_histograms

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        delta = histogram_rollup(batch_df, [], val_col, lo, width, nbins)
        prev = _state_before(batch_df.sparkSession, state_dir, batch_id)
        merged = (
            prev.unionByName(delta).groupBy("bin").agg(F.sum("n").alias("n"))
            if prev is not None
            else delta
        )
        _publish_version(merged, state_dir, batch_id)

    q = (
        new_stream.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir or state_dir + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"psi_drift_stream did not finish within {timeout_sec}s"
        )
    state = latest_rollup_state(new_stream.sparkSession, state_dir)
    if state is None:
        raise RuntimeError(f"psi_drift_stream produced no state under {state_dir}")
    hb = histogram_rollup(base, [], val_col, lo, width, nbins).withColumnRenamed(
        "n", "n_base"
    )
    return psi_from_histograms(
        hb, state.withColumnRenamed("n", "n_new"), nbins
    )


def cusum_stream(
    new_stream: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """STREAMING changepoint monitor — the offline CUSUM locator
    (:func:`xesmf_spark.timeseries.cusum_changepoints`) run the way
    production runs it: every micro-batch SUM-aggregates its
    ``(keys, bucket, value)`` rows and merges them into the persistent
    versioned rollup state inside ``foreachBatch`` (the
    :func:`rollup_stream` at-least-once discipline — merge onto the
    newest STRICTLY-EARLIER version, idempotent republish,
    crash-atomic rename), then the FINAL state feeds the batch CUSUM
    op.  Sums are mergeable integer partials, so N-batch maintenance
    is bit-identical to the batch op on the union — exactly what the
    oracle computes.

    Scale shape: per batch one map-side-combinable keyed SUM + a merge
    against O(state) rows — never raw event volume; the CUSUM tail is
    the batch op's windows over state."""
    from xesmf_spark.timeseries import cusum_changepoints

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy(*key_cols, bucket_col).agg(
            F.sum(val_col).alias(val_col)
        )
        prev = _state_before(batch_df.sparkSession, state_dir, batch_id)
        merged = (
            prev.unionByName(delta)
            .groupBy(*key_cols, bucket_col)
            .agg(F.sum(val_col).alias(val_col))
            if prev is not None
            else delta
        )
        _publish_version(merged, state_dir, batch_id)

    q = (
        new_stream.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir or state_dir + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(f"cusum_stream did not finish within {timeout_sec}s")
    state = latest_rollup_state(new_stream.sparkSession, state_dir)
    if state is None:
        raise RuntimeError(f"cusum_stream produced no state under {state_dir}")
    return cusum_changepoints(state, key_cols, bucket_col, val_col)
