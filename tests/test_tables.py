"""Schema-drift contract tests (xesmf_spark.tables).

The driver's testdata changed events.ts physical encoding between
rounds (INT64 TIMESTAMP(NANOS) → timestamp[us]); these tests pin the
normalization layer: BOTH encodings must flow through the events
queries and produce identical results.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xesmf_spark import queries as Q
from xesmf_spark.tables import load_table, normalize_events

N = 400
RNG = np.random.default_rng(7)


def _events_pdf():
    # multi-user event log with gaps straddling the 30-min session cut
    base_ns = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z
    steps = RNG.integers(1, 90 * 60, N).cumsum() * 1_000_000_000
    return pd.DataFrame(
        {
            "event_id": np.arange(N, dtype=np.int64),
            "ts_ns": (base_ns + steps).astype(np.int64),
            "user_id": RNG.integers(0, 10, N).astype(np.int64),
            "event_type": np.where(RNG.random(N) < 0.5, "click", "view"),
            "value": np.round(RNG.random(N) * 100, 2),
            "props": ["{}"] * N,
        }
    )


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    """Two sf-dir layouts of the SAME events: INT64-nanos and
    timestamp[us] physical encodings."""
    pdf = _events_pdf()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    d_ns = tmp_path_factory.mktemp("sf_nanos")
    t = pa.table(
        {**{c: pdf[c] for c in cols if c != "ts"}, "ts": pdf["ts_ns"].astype("datetime64[ns]")}
    ).select(cols)
    assert t.schema.field("ts").type == pa.timestamp("ns")
    pq.write_table(t, d_ns / "events.parquet")  # INT64 TIMESTAMP(NANOS)

    d_us = tmp_path_factory.mktemp("sf_micros")
    t2 = pa.table(
        {**{c: pdf[c] for c in cols if c != "ts"},
         "ts": pdf["ts_ns"].astype("datetime64[ns]").astype("datetime64[us]")}
    ).select(cols)
    assert t2.schema.field("ts").type == pa.timestamp("us")
    pq.write_table(t2, d_us / "events.parquet")

    return str(d_ns), str(d_us), pdf


def test_load_table_normalizes_both_encodings(spark, fixture_dirs):
    d_ns, d_us, pdf = fixture_dirs
    for d in (d_ns, d_us):
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "bigint"
        got = sorted(r.ts for r in df.select("ts").collect())
        want = sorted(pdf["ts_ns"].tolist())
        # micros encoding floors the nanos to µs resolution; the fixture
        # uses whole-second steps so both encodings carry exact values
        assert got == want


def test_events_sessionize_identical_across_encodings(spark, fixture_dirs):
    d_ns, d_us, _ = fixture_dirs
    a = {r.user_id: (r.n_sessions, r.n_events, r.total_value)
         for r in Q.events_sessionize(spark, d_ns).collect()}
    b = {r.user_id: (r.n_sessions, r.n_events, r.total_value)
         for r in Q.events_sessionize(spark, d_us).collect()}
    assert a and a == b


def test_events_hourly_identical_across_encodings(spark, fixture_dirs):
    d_ns, d_us, _ = fixture_dirs
    a = {(r.epoch_hour, r.event_type): (r.n, r.sum_value)
         for r in Q.events_hourly(spark, d_ns).collect()}
    b = {(r.epoch_hour, r.event_type): (r.n, r.sum_value)
         for r in Q.events_hourly(spark, d_us).collect()}
    assert a and a == b


def test_instant_timestamp_encoding_is_tz_independent(spark, tmp_path):
    """isAdjustedToUTC=true parquet (pa.timestamp tz='UTC' → Spark
    TimestampType) must normalize to the same epoch nanos regardless of
    spark.sql.session.timeZone — unix_micros is instant-based, unlike a
    CAST-to-NTZ route which bakes in the session zone's wall clock."""
    pdf = _events_pdf()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    t = pa.table(
        {**{c: pdf[c] for c in cols if c != "ts"},
         "ts": pa.Array.from_pandas(
             pdf["ts_ns"].astype("datetime64[ns]").astype("datetime64[us]")
         ).cast(pa.timestamp("us", tz="UTC"))}
    ).select(cols)
    assert t.schema.field("ts").type == pa.timestamp("us", tz="UTC")
    pq.write_table(t, tmp_path / "events.parquet")

    want = sorted(pdf["ts_ns"].tolist())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = load_table(spark, str(tmp_path), "events")
            assert dict(df.dtypes)["ts"] == "bigint"
            got = sorted(r.ts for r in df.select("ts").collect())
            assert got == want, f"epoch skew under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_event_time_col_exact_integer_division(spark):
    """ns→µs must use integer division: epoch-ns (~1.7e18) exceeds 2^53,
    so a double-division route rounds by up to 256 ns and misplaces
    ~1.6% of µs-grain values by one microsecond."""
    from pyspark.sql import functions as F

    from xesmf_spark.tables import event_time_col

    base = 1_704_067_200_000_000_000
    # ...016000 ns is a verified double-rounding victim; include an exact
    # hour boundary and a sweep of µs offsets
    ns_vals = [base, base + 16_000, base + 3_600_000_000_000] + [
        base + k * 1_000 for k in range(1, 2001)
    ]
    df = spark.createDataFrame([(v,) for v in ns_vals], "ts long")
    rows = df.select(
        F.col("ts"),
        F.unix_micros(event_time_col("ts")).alias("us"),
    ).collect()
    bad = [(r.ts, r.us) for r in rows if r.us != r.ts // 1000]
    assert bad == []


def test_normalize_rejects_unknown_encoding(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").cast("string").alias("ts"))
    with pytest.raises(TypeError, match="schema drift"):
        normalize_events(df)
