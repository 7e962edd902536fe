"""Streaming-vs-batch parity tests (Structured Streaming surface)."""

import pytest
from pyspark.sql import functions as F

from xesmf_spark import streaming as ST

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_hourly_matches_batch(spark, tmp_path):
    """The windowed streaming aggregate over the full (finite) input
    must equal the batch groupBy — append mode emits every window once
    the availableNow run drains the source."""
    import shutil

    # file stream sources read DIRECTORIES; stage the single-file table
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(EVENTS, src_dir / "part-000.parquet")
    # final-window flush: far-future sentinel advances the closing
    # watermark past every real window
    ST.stage_flush_sentinel(
        str(src_dir),
        offset_ns=24 * 3600 * 1_000_000_000,
        overrides={"event_type": ST.FLUSH_MARKER},
    )
    ev = ST.events_stream(spark, str(src_dir))
    out = ST.run_to_memory(
        ST.stream_hourly_events(ev), "hourly_test", output_mode="append"
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in out.collect()
        if r.event_type != ST.FLUSH_MARKER
    }
    from xesmf_spark.tables import event_time_col, normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        normalize_events(spark.read.parquet(EVENTS))
        .withColumn("event_ts", event_time_col("ts"))
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    # with the sentinel flush the finite-input stream equals batch
    # EXACTLY — no held-back windows, no slack
    assert got == want
    assert len(got) > 0


def test_regrid_stream_matches_batch(spark, tmp_path):
    """Streaming weight application == batch join-agg on the same
    (finite) field stream."""
    from xesmf_spark.grids import grid_global, wave_smooth
    from xesmf_spark.weights import conservative_weights

    g_in = grid_global(spark, 20, 12)
    g_out = grid_global(spark, 15, 9)
    w = conservative_weights(g_in, g_out)
    w.persist().count()

    # finite field "stream": 3 hourly slices of the wave field
    field_dir = str(tmp_path / "field_stream")
    (
        g_in.df.select("cell_id", wave_smooth().alias("value"))
        .crossJoin(
            spark.range(3).select(
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 3600).alias(
                    "event_ts"
                )
            )
        )
        .select("event_ts", "cell_id", "value")
        .write.parquet(field_dir)
    )
    static = spark.read.parquet(field_dir)
    # flush sentinel: cell_id -1 matches no weight row, so it only
    # advances the watermark (the watermark node sits BEFORE the join)
    ST.stage_flush_sentinel(
        field_dir,
        offset_ns=6 * 3600 * 1_000_000_000,
        ts_col="event_ts",
        overrides={"cell_id": -1, "value": 0.0},
    )
    stream = spark.readStream.schema(static.schema).parquet(field_dir)
    # zero watermark: the finite fixture spans only 3 hours, so any
    # horizon >= the span would hold back every window in append mode
    out = ST.run_to_memory(
        ST.regrid_stream(stream, w, g_out, watermark="0 seconds"),
        "regrid_stream_test",
    )
    got = {(r.window_start, r.row): r.value for r in out.collect()}
    batch = (
        static.join(w, F.col("cell_id") == F.col("col"))
        .groupBy(F.window("event_ts", "1 hour").alias("wd"), "row")
        .agg(F.sum(F.col("S") * F.col("value")).alias("value"))
        .select(F.col("wd.start").alias("window_start"), "row", "value")
    )
    want = {(r.window_start, r.row): r.value for r in batch.collect()}
    # sentinel flush: every window (including the last) must be emitted
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(want[k] - v) < 1e-12


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: emitted (closed) sessions
    must equal the batch lag-based sessionization minus each user's
    final (still-open) session."""
    import shutil

    from xesmf_spark.tables import normalize_events

    src_dir = tmp_path / "ev_sess"
    src_dir.mkdir()
    shutil.copy(EVENTS, src_dir / "part-000.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # normalize to contract nanos BEFORE staging, so the staged stream
    # carries the logical schema (drift handling itself is covered by
    # test_tables.py)
    static = normalize_events(spark.read.parquet(str(src_dir)))
    # split into several files so the run spans multiple micro-batches
    # (state must carry across batches)
    multi_dir = tmp_path / "ev_sess_multi"
    static.orderBy("ts").coalesce(1).limit(3000).write.parquet(str(multi_dir))
    static.orderBy("ts").exceptAll(static.orderBy("ts").limit(3000)).coalesce(1).write.mode(
        "append"
    ).parquet(str(multi_dir))
    # per-user flush sentinels: every user's final session closes, so
    # the stream emits the FULL batch session list
    ST.stage_flush_sentinel(
        str(multi_dir),
        offset_ns=24 * 3600 * 1_000_000_000,
        user_col="user_id",
        overrides={"event_type": ST.FLUSH_MARKER},
    )
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(multi_dir))
    )
    out = ST.run_to_memory(
        ST.sessionize_stream(stream, gap_minutes=30), "sessionize_state_test"
    )
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.total_value, 6))
        for r in out.collect()
    }

    # batch truth: lag-based session assembly over the REAL events —
    # with the sentinel flush, ALL sessions are expected (no minus-last)
    from pyspark.sql import Window

    gap_ns = 30 * 60 * 1_000_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        spark.read.parquet(str(multi_dir))
        .filter(F.col("event_type") != ST.FLUSH_MARKER)
        .withColumn(
            "new_s",
            F.when(
                F.lag("ts").over(w).isNull() | (F.col("ts") - F.lag("ts").over(w) > gap_ns), 1
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.total_value, 6))
        for r in sess.collect()
    }
    assert got == want
    assert len(got) > 0


def test_interval_join_stream_outer_multibatch_matches_batch(spark, tmp_path):
    """Watermarked LEFT OUTER stream-stream join across REAL multiple
    micro-batches (3 time-slab files, maxFilesPerTrigger=1) == the batch
    LEFT range join. The outer wing is the hard part: unmatched left
    rows are held in state until the watermark passes their join
    horizon, so the sentinel must advance BOTH sides' watermark nodes
    (it passes both event-type filters) and Spark's closing no-data
    micro-batch must evict-and-emit them."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    tbl = pq.read_table(EVENTS)
    ts = tbl.column("ts")
    lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    slabs = [
        tbl.filter(pc.less(ts, cut1)),
        tbl.filter(pc.and_(pc.greater_equal(ts, cut1), pc.less(ts, cut2))),
        tbl.filter(pc.greater_equal(ts, cut2)),
    ]
    import time

    for i, slab in enumerate(slabs):
        assert slab.num_rows > 0
        pq.write_table(slab, src_dir / f"part-{i:03d}.parquet")
        time.sleep(0.05)  # distinct mtimes => deterministic batch order
    ST.stage_flush_sentinel(
        str(src_dir),
        offset_ns=24 * 3600 * 1_000_000_000,
        overrides={"event_type": ST.FLUSH_MARKER},
    )

    ev = ST.events_stream(spark, str(src_dir), max_files=1)
    purch = ev.filter(F.col("event_type").isin("purchase", ST.FLUSH_MARKER)).select(
        "user_id",
        F.col("event_type").alias("p_type"),
        F.col("event_ts").alias("p_event_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.filter(F.col("event_type").isin("click", ST.FLUSH_MARKER)).select(
        "user_id",
        F.col("event_ts").alias("c_event_ts"),
        F.col("event_id").alias("click_id"),
    )
    out = ST.interval_join_stream_outer(
        purch,
        clicks,
        on="user_id",
        left_ts="p_event_ts",
        right_ts="c_event_ts",
        lower_sec=-3600,
        upper_sec=0,
    )
    res = ST.run_to_memory(out, "ij_outer_multibatch_test")
    got = {
        (r.purchase_id, r.click_id)
        for r in res.filter(F.col("p_type") != ST.FLUSH_MARKER).collect()
    }

    from xesmf_spark.tables import event_time_col, normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev_b = normalize_events(spark.read.parquet(EVENTS)).withColumn(
        "event_ts", event_time_col("ts")
    )
    p_b = ev_b.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_ts").alias("p_event_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c_b = ev_b.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_ts").alias("c_event_ts"),
        F.col("event_id").alias("click_id"),
    )
    j_b = p_b.join(
        c_b,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_event_ts") >= F.col("p_event_ts") - F.expr("INTERVAL 3600 SECOND"))
        & (F.col("c_event_ts") <= F.col("p_event_ts")),
        "left",
    )
    want = {(r.purchase_id, r.click_id) for r in j_b.collect()}
    assert got == want
    # the outer wing must actually fire: some purchase with no click
    assert any(c is None for _, c in got)
    # and the inner wing too
    assert any(c is not None for _, c in got)


def test_dedup_stream_matches_batch_digests(spark, tmp_path):
    """Streaming exact dedup must keep exactly ONE row per normalized
    content digest — the same digest set as the batch exact_dedup, and
    the survivor must be a genuine member of its duplicate group.
    (WITHIN a micro-batch the survivor is whichever arrival the state
    store sees first — partition order, not event time — so the test
    asserts group membership, not a specific id.)"""
    import shutil

    from xesmf_spark import pipeline as PL

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select("doc_id", "text")
    # planted duplicates arriving LATER (higher doc_id -> later event_ts)
    dup = docs.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    both = base.unionByName(dup)
    d = tmp_path / "docs_src"
    d.mkdir()
    both.coalesce(1).write.mode("overwrite").parquet(str(d))

    static = spark.read.parquet(str(d))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("event_ts", F.timestamp_seconds(F.col("doc_id")))
    )
    out = ST.run_to_memory(
        ST.dedup_stream(stream).select("doc_id", "content_key"),
        "q_dedup_parity",
    )
    got = {r.content_key: r.doc_id for r in out.collect()}

    batch = PL.exact_dedup(both)
    groups = {
        r.content_key: (
            {r.keep_id, r.keep_id + 100000} if r.n_docs == 2 else {r.keep_id}
        )
        for r in batch.collect()
    }
    assert set(got) == set(groups)  # same digest universe
    assert len(got) == base.count()  # every duplicate digest collapsed
    assert all(got[key] in members for key, members in groups.items())
    # the 20 planted digests really had 2 members (the dedup did work)
    assert sum(1 for m in groups.values() if len(m) == 2) == 20


def test_rollup_stream_matches_batch(spark, tmp_path):
    """Streaming continuous-aggregate maintenance: N single-file
    micro-batches partial-aggregated and merged into versioned parquet
    state must equal the from-scratch batch rollup EXACTLY (integer
    partials), and stale state versions must be pruned to the last 2."""
    import os

    from xesmf_spark.relational import rollup_delta

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from xesmf_spark.tables import normalize_events

    ev_batch = normalize_events(spark.read.parquet(EVENTS))
    # stage 3 ts-range slabs -> 3 real micro-batches
    src_dir = tmp_path / "events_split"
    ev_batch.repartitionByRange(3, "ts").write.parquet(str(src_dir))
    stream = ST.events_stream(spark, str(src_dir), max_files=1)

    HOUR_NS = 3_600_000_000_000
    aggs = {"n": F.count(F.lit(1)), "sum_cents": F.sum(F.expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))}
    state_dir = str(tmp_path / "rollup_state")
    final = ST.rollup_stream(
        stream, state_dir, HOUR_NS, ["event_type"], aggs,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    want = rollup_delta(ev_batch, HOUR_NS, ["event_type"], agg_exprs=aggs)
    key = lambda r: (r.bucket, r.event_type, r.n, r.sum_cents)
    assert sorted(map(key, final.collect())) == sorted(map(key, want.collect()))
    # version pruning: at most the last two state versions survive
    versions = [e for e in os.listdir(state_dir) if e.startswith("v")]
    assert 1 <= len(versions) <= 2


def test_rollup_stream_checkpoint_resume(spark, tmp_path):
    """The production claim of the maintenance loop: a SECOND
    availableNow run against the same checkpoint processes ONLY files
    that arrived since the first run, merging on top of the existing
    state — and the final state still equals the from-scratch batch
    rollup over everything."""
    import shutil

    from xesmf_spark.relational import rollup_delta

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from xesmf_spark.tables import normalize_events

    ev_batch = normalize_events(spark.read.parquet(EVENTS))
    halves = ev_batch.randomSplit([0.5, 0.5], seed=7)
    src_dir = tmp_path / "events_resume"
    src_dir.mkdir()
    HOUR_NS = 3_600_000_000_000
    aggs = {"n": F.count(F.lit(1)), "sum_cents": F.sum(F.expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))}
    state_dir, cp = str(tmp_path / "state"), str(tmp_path / "cp")

    # first arrival: half the stream
    halves[0].coalesce(1).write.parquet(str(tmp_path / "h0"))
    for f in (tmp_path / "h0").glob("part-*.parquet"):
        shutil.copy(f, src_dir / "batch0.parquet")
    stream = ST.events_stream(spark, str(src_dir), max_files=1)
    mid = ST.rollup_stream(stream, state_dir, HOUR_NS, ["event_type"], aggs,
                           checkpoint_dir=cp)
    want_mid = rollup_delta(normalize_events(spark.read.parquet(str(src_dir))),
                            HOUR_NS, ["event_type"], agg_exprs=aggs)
    key = lambda r: (r.bucket, r.event_type, r.n, r.sum_cents)
    assert sorted(map(key, mid.collect())) == sorted(map(key, want_mid.collect()))

    # late arrival: the other half lands; SAME checkpoint — only the new
    # file is processed, merged onto the persisted state
    halves[1].coalesce(1).write.parquet(str(tmp_path / "h1"))
    for f in (tmp_path / "h1").glob("part-*.parquet"):
        shutil.copy(f, src_dir / "batch1.parquet")
    stream2 = ST.events_stream(spark, str(src_dir), max_files=1)
    final = ST.rollup_stream(stream2, state_dir, HOUR_NS, ["event_type"], aggs,
                             checkpoint_dir=cp)
    want = rollup_delta(ev_batch, HOUR_NS, ["event_type"], agg_exprs=aggs)
    assert sorted(map(key, final.collect())) == sorted(map(key, want.collect()))


def test_rollup_stream_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch must merge onto
    the version written by a STRICTLY EARLIER batch — never the version
    it wrote itself on a failed attempt (double-count). Simulated by
    invoking the version-selection helper directly."""
    from xesmf_spark.relational import rollup_delta

    ev = spark.createDataFrame(
        [(1_000_000 * (i % 5), f"t{i % 2}", i) for i in range(50)],
        "ts long, event_type string, v long",
    )
    aggs = {"n": F.count(F.lit(1))}
    state_dir = str(tmp_path / "state")
    d0 = rollup_delta(ev, 2_000_000, ["event_type"], agg_exprs=aggs)
    d0.write.parquet(state_dir + "/v000000000")
    # batch 0 replay: its own v0 must be invisible
    assert ST._state_before(spark, state_dir, 0) is None
    # batch 1 sees v0
    prev = ST._state_before(spark, state_dir, 1)
    key = lambda r: (r.bucket, r.event_type, r.n)
    assert sorted(map(key, prev.collect())) == sorted(map(key, d0.collect()))
    # batch 1 wrote v1 then crashed pre-commit: its replay still sees v0
    d0.write.parquet(state_dir + "/v000000001")
    again = ST._state_before(spark, state_dir, 1)
    assert sorted(map(key, again.collect())) == sorted(map(key, d0.collect()))


def test_rollup_stream_forwards_merge_monoids(spark, tmp_path):
    """min/max partials survive the streaming maintenance loop end to
    end when the merge map is forwarded."""
    from xesmf_spark.relational import rollup_delta

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from xesmf_spark.tables import normalize_events

    ev_batch = normalize_events(spark.read.parquet(EVENTS))
    src_dir = tmp_path / "events_mm"
    ev_batch.repartitionByRange(2, "ts").write.parquet(str(src_dir))
    stream = ST.events_stream(spark, str(src_dir), max_files=1)
    HOUR_NS = 3_600_000_000_000
    aggs = {
        "n": F.count(F.lit(1)),
        "lo": F.min(F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")),
        "hi": F.max(F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")),
    }
    final = ST.rollup_stream(
        stream, str(tmp_path / "state"), HOUR_NS, ["event_type"], aggs,
        checkpoint_dir=str(tmp_path / "cp"), merge={"lo": "min", "hi": "max"},
    )
    want = rollup_delta(ev_batch, HOUR_NS, ["event_type"], agg_exprs=aggs)
    key = lambda r: (r.bucket, r.event_type, r.n, r.lo, r.hi)
    assert sorted(map(key, final.collect())) == sorted(map(key, want.collect()))


def test_rollup_stream_torn_publish_invisible(spark, tmp_path):
    """Crash-atomic publish (r7 review): a version directory without the
    parquet committer's _SUCCESS marker — a writer killed mid-write —
    must be invisible to BOTH readers (latest_rollup_state and the
    replay predecessor), even when it is the newest version, and a
    resumed run must recover to the exact from-scratch rollup."""
    import shutil

    from xesmf_spark.relational import rollup_delta

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from xesmf_spark.tables import normalize_events

    ev_batch = normalize_events(spark.read.parquet(EVENTS))
    halves = ev_batch.randomSplit([0.5, 0.5], seed=11)
    src_dir = tmp_path / "events_torn"
    src_dir.mkdir()
    HOUR_NS = 3_600_000_000_000
    aggs = {"n": F.count(F.lit(1)), "sum_cents": F.sum(F.expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))}
    state_dir, cp = str(tmp_path / "state"), str(tmp_path / "cp")

    halves[0].coalesce(1).write.parquet(str(tmp_path / "h0"))
    for f in (tmp_path / "h0").glob("part-*.parquet"):
        shutil.copy(f, src_dir / "batch0.parquet")
    mid = ST.rollup_stream(ST.events_stream(spark, str(src_dir), max_files=1),
                           state_dir, HOUR_NS, ["event_type"], aggs,
                           checkpoint_dir=cp)
    key = lambda r: (r.bucket, r.event_type, r.n, r.sum_cents)
    committed = sorted(map(key, mid.collect()))

    # simulate a kill mid-write: a NEWEST version dir holding a parquet
    # fragment but no _SUCCESS marker (truncated publish)
    import os

    torn = os.path.join(state_dir, "v000000099")
    os.makedirs(torn)
    frag = next((tmp_path / "h0").glob("part-*.parquet"))
    shutil.copy(frag, os.path.join(torn, "part-00000.parquet"))
    # ...and staging debris from the same crash
    os.makedirs(os.path.join(state_dir, ".staging_v000000099"))

    # both readers skip the torn newest version
    assert sorted(map(key, ST.latest_rollup_state(spark, state_dir).collect())) \
        == committed
    assert sorted(map(key, ST._state_before(spark, state_dir, 100).collect())) \
        == committed

    # recovery: the second half arrives, the resumed run merges onto the
    # committed predecessor and matches the from-scratch batch rollup
    halves[1].coalesce(1).write.parquet(str(tmp_path / "h1"))
    for f in (tmp_path / "h1").glob("part-*.parquet"):
        shutil.copy(f, src_dir / "batch1.parquet")
    final = ST.rollup_stream(ST.events_stream(spark, str(src_dir), max_files=1),
                             state_dir, HOUR_NS, ["event_type"], aggs,
                             checkpoint_dir=cp)
    want = rollup_delta(ev_batch, HOUR_NS, ["event_type"], agg_exprs=aggs)
    assert sorted(map(key, final.collect())) == sorted(map(key, want.collect()))


def test_heavy_hitters_stream_mergeable_guarantees(spark, tmp_path):
    """Streaming MG maintenance over REAL multi-batch progress: the
    final merged summary must satisfy the mergeable-summaries bounds
    vs exact counts of the WHOLE stream (est <= exact, gap <= delta,
    heavy keys present), state must stay O(capacity) rows, and the
    version directory must hold only committed versions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_dir = tmp_path / "docs_stream"
    src_dir.mkdir()
    # 3 batches: distinct filler keys per batch + a heavy key woven
    # through ALL batches (cross-batch mass must merge, not reset)
    for b in range(3):
        texts = [f"filler{b}_{i}" for i in range(600)] + ["heavy"] * 150
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(b * 1000, b * 1000 + len(texts))),
                    "text": pa.array(texts),
                }
            ),
            src_dir / f"part-{b:03d}.parquet",
        )
        import time

        time.sleep(0.05)

    static = spark.read.parquet(str(src_dir))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    state_dir = str(tmp_path / "hh_state")
    final = ST.heavy_hitters_stream(
        stream,
        state_dir,
        to_tokens=lambda df: df.select(F.col("text").alias("token")),
        capacity=64,
    )
    sk = {r.token: r.est for r in final.collect()}
    delta = sk.pop(None)
    assert len(sk) <= 64  # re-trim keeps state bounded
    # exact counts over the whole 3-batch stream
    exact = {f"filler{b}_{i}": 1 for b in range(3) for i in range(600)}
    exact["heavy"] = 450
    for t, est in sk.items():
        assert est <= exact[t]
        assert exact[t] - est <= delta
    # total mass 2250, capacity 64 -> delta <= N/(cap+1) ~ 35 per the
    # mergeable bound; 'heavy' (450) is guaranteed present and tight
    assert exact["heavy"] > delta
    assert "heavy" in sk and 450 - sk["heavy"] <= delta
    # only committed versions visible
    vs = ST._committed_versions(state_dir)
    assert vs and all(v.startswith("v") for v in vs)


def test_cdc_apply_stream_matches_batch_lww(spark, tmp_path):
    """4-batch streaming last-write-wins equals the batch argmax per
    key, including keys that are updated in several different batches
    and keys seen only in the first batch."""
    from xesmf_spark.streaming import cdc_apply_stream

    rows = [
        # (user, ts, val) — user 1 updated in batches 0,1,3; user 2
        # only batch 0; user 3 in batches 2,3
        [(1, 10, "a"), (2, 11, "b")],
        [(1, 20, "c")],
        [(3, 30, "d")],
        [(1, 40, "e"), (3, 35, "f")],
    ]
    src = tmp_path / "cdc_src"
    src.mkdir()
    for i, batch in enumerate(rows):
        spark.createDataFrame(
            batch, "user_id long, ts long, val string"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    static = spark.read.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    state = str(tmp_path / "cdc_state")
    final = cdc_apply_stream(
        stream, state, ["user_id"], "ts", checkpoint_dir=str(tmp_path / "cp")
    )
    got = {(r.user_id): (r.ts, r.val) for r in final.collect()}
    assert got == {1: (40, "e"), 2: (11, "b"), 3: (35, "f")}


def test_cdc_apply_stream_tombstones(spark, tmp_path):
    """Delete ops remove keys from the LIVE view but stay in state:
    user 1 is deleted in a late batch (vanishes), user 2 is deleted
    then re-upserted with a newer ts (reappears with the new value),
    user 3 is never deleted. The live view drops the op column."""
    from xesmf_spark.streaming import cdc_apply_stream, latest_rollup_state

    rows = [
        [(1, 10, "a", "upsert"), (2, 11, "b", "upsert"), (3, 12, "c", "upsert")],
        [(2, 20, "x", "delete")],
        [(1, 30, "x", "delete"), (2, 31, "B", "upsert")],
    ]
    src = tmp_path / "cdc_src"
    src.mkdir()
    for i, batch in enumerate(rows):
        spark.createDataFrame(
            batch, "user_id long, ts long, val string, op string"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
    static = spark.read.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    state = str(tmp_path / "cdc_state")
    final = cdc_apply_stream(
        stream, state, ["user_id"], "ts",
        checkpoint_dir=str(tmp_path / "cp"), op_col="op",
    )
    assert "op" not in final.columns
    got = {r.user_id: (r.ts, r.val) for r in final.collect()}
    assert got == {2: (31, "B"), 3: (12, "c")}
    # the tombstone is retained in STATE (it must keep winning LWW
    # against older upserts arriving later), only the view filters it
    raw = latest_rollup_state(spark, state)
    ops = {r.user_id: r.op for r in raw.collect()}
    assert ops == {1: "delete", 2: "upsert", 3: "upsert"}


def _tws_available() -> bool:
    """transformWithStateInPandas (the Spark 4 StatefulProcessor API)
    ships a protobuf-based driver-worker channel; this container has no
    google.protobuf, so the runner crashes at init. The CAPABILITY is
    covered by the applyInPandasWithState sessionizer and the
    foreachBatch versioned-state operators; this gate documents why
    the newer API surface is not exercised here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _tws_available(), reason="google.protobuf absent — transformWithState runner cannot start in this container")
def test_transform_with_state_running_count(spark, tmp_path):
    """Per-key running count via the Spark 4 StatefulProcessor API,
    equal to the batch groupBy count on a finite stream."""
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor

    class Counter(StatefulProcessor):
        def init(self, handle):
            self._cnt = handle.getValueState("cnt", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._cnt.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self):
            pass

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 5), (1, 6), (2, 7)], "user_id long, v long"
    ).write.parquet(src)
    st = spark.readStream.schema("user_id long, v long").parquet(src)
    out = st.groupBy("user_id").transformWithStateInPandas(
        Counter(),
        outputStructType="user_id bigint, n bigint",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {r.user_id: r.n for r in spark.sql("SELECT * FROM tws_test").collect()}
    assert got == {1: 2, 2: 1}


def test_psi_drift_stream_equals_batch(spark, tmp_path):
    """Streaming PSI maintenance: N-batch histogram merge == the batch
    psi_drift on the same data (sum-mergeable counts), including
    state versioning across micro-batches."""
    import pyspark.sql.functions as F

    from xesmf_spark.quality import psi_drift
    from xesmf_spark.streaming import psi_drift_stream

    # 3 slab files -> 3 micro-batches with maxFilesPerTrigger=1
    src = tmp_path / "vals"
    for part in range(3):
        spark.createDataFrame(
            [((part * 100 + i) % 97,) for i in range(200)], "cents long"
        ).coalesce(1).write.mode("append").parquet(str(src))
    base = spark.createDataFrame([((7 * i) % 97,) for i in range(150)], "cents long")

    stream = (
        spark.readStream.schema("cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = psi_drift_stream(
        stream, base, "cents", lo=0, width=10, nbins=10,
        state_dir=str(tmp_path / "state"),
    ).orderBy("bin").collect()

    new_batch = spark.read.parquet(str(src))
    want = psi_drift(base, new_batch, "cents", lo=0, width=10, nbins=10).orderBy(
        "bin"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 10 and got[0]["psi_micro"] >= 0


def test_cusum_stream_equals_batch(spark, tmp_path):
    """Streaming CUSUM maintenance: N-batch sum-merged rollup state ==
    the batch cusum_changepoints on the union (mergeable integer
    partials), including state versioning across micro-batches."""
    from xesmf_spark.streaming import cusum_stream
    from xesmf_spark.timeseries import cusum_changepoints

    src = tmp_path / "vals"
    rows_all = []
    for part in range(3):
        rows = [
            ("k%d" % (i % 2), (part * 5 + i) % 12, 10 + ((part * 7 + i) % 9))
            for i in range(60)
        ]
        rows_all += rows
        spark.createDataFrame(
            rows, "k string, t long, x long"
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("k string, t long, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = (
        cusum_stream(stream, ["k"], "t", "x", state_dir=str(tmp_path / "st"))
        .orderBy("k")
        .collect()
    )
    batch = (
        spark.createDataFrame(rows_all, "k string, t long, x long")
        .groupBy("k", "t")
        .agg(__import__("pyspark.sql.functions", fromlist=["sum"]).sum("x").alias("x"))
    )
    want = cusum_changepoints(batch, ["k"], "t", "x").orderBy("k").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 2


def test_stream_sliding_matches_batch(spark, tmp_path):
    """Sliding 2h/1h windowed streaming aggregate over the finite input
    equals the batch sliding-window groupBy exactly (every event lands
    in two hour-aligned windows; the sentinel flush closes all)."""
    import shutil

    src_dir = tmp_path / "events_stream_sl"
    src_dir.mkdir()
    shutil.copy(EVENTS, src_dir / "part-000.parquet")
    ST.stage_flush_sentinel(
        str(src_dir),
        offset_ns=24 * 3600 * 1_000_000_000,
        overrides={"event_type": ST.FLUSH_MARKER},
    )
    ev = ST.events_stream(spark, str(src_dir))
    out = ST.run_to_memory(
        ST.stream_sliding_events(ev), "sliding_test", output_mode="append"
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in out.collect()
        if r.event_type != ST.FLUSH_MARKER
    }
    from xesmf_spark.tables import event_time_col, normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        normalize_events(spark.read.parquet(EVENTS))
        .withColumn("event_ts", event_time_col("ts"))
        .groupBy(F.window("event_ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want and len(got) > 0
    # every tumbling hour appears in exactly two sliding windows:
    # per-type row count doubles vs the 1h tumbling agg (hour set is
    # contiguous in this fixture, edges included via the half-open span)
