from pyspark.sql import functions as F  # noqa: F401

from xesmf_spark.timeseries import ewma_rollup, mad_anomalies


def test_ewma_weights_missing_buckets_count_zero(spark):
    """Hand-computed: series k=a has x=10 at t=0 and x=20 at t=2 (t=1
    missing => contributes zero).  window=3, weights 4/2/1, denom 7."""
    rows = [("a", 0, 10), ("a", 2, 20), ("b", 5, 7)]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        (row.k, row.t): row.ewma_micro
        for row in ewma_rollup(r, ["k"], "t", "x", window=3).collect()
    }
    M = 1_000_000
    assert got == {
        ("a", 0): (M * 4 * 10) // 7,            # only itself
        ("a", 2): (M * (4 * 20 + 1 * 10)) // 7,  # gap-2 neighbor weight 1
        ("b", 5): (M * 4 * 7) // 7,
    }
    # no output bucket for absent t=1 (targets are existing state rows)
    assert ("a", 1) not in got


def test_mad_flags_spike_robustly(spark):
    """A single spike is flagged while the quiet buckets are not, and
    the spike cannot drag the threshold: median/MAD of
    [10,10,10,12,100] are 10 and 0 => any deviation > 0 is anomalous
    (both 12 and 100), while the 10s are not."""
    rows = [("a", i, v) for i, v in enumerate([10, 10, 10, 12, 100])]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = {row.t: (row.med, row.mad, row.is_anomaly) for row in
           mad_anomalies(r, ["k"], "x", n_sigmas=3).collect()}
    assert got[0] == (10.0, 0.0, False)
    assert got[3] == (10.0, 0.0, True)
    assert got[4] == (10.0, 0.0, True)


def test_mad_interpolated_median_halves(spark):
    """Even-count groups interpolate the median to an exact half and
    deviations to quarters — the documented exact-binary contract."""
    rows = [("a", i, v) for i, v in enumerate([1, 2, 4, 9])]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    out = mad_anomalies(r, ["k"], "x", n_sigmas=3).collect()
    assert out[0].med == 3.0  # (2+4)/2
    # deviations: 2,1,1,6 -> sorted 1,1,2,6 -> mad = 1.5
    assert out[0].mad == 1.5
    flagged = {row.t for row in out if row.is_anomaly}
    assert flagged == {3}  # |9-3|=6 > 4.5 ; |1-3|=2 <= 4.5


def test_trend_slope_integer_ols(spark):
    """The integer OLS recurrence matches the closed form on a known
    series: y = 3x + 7 -> slope_micro = 3_000_000 exactly; a
    decreasing series yields the negative slope truncated toward zero
    identically to the oracle's // semantics."""
    from xesmf_spark.queries import events_trend_slope  # noqa: F401  (recurrence lives in the query)
    from pyspark.sql import functions as F
    from xesmf_spark.relational import _floor_div  # noqa: F401

    daily = spark.createDataFrame(
        [("up", x, 3 * x + 7) for x in range(10, 16)]
        + [("down", x, 100 - 2 * x) for x in range(10, 16)],
        "event_type string, day long, n long",
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("day").alias("sx"),
        F.sum("n").alias("sy"),
        F.sum(F.col("day") * F.col("n")).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
    )
    out = {
        r.event_type: r.slope_micro
        for r in sums.select(
            "event_type",
            F.expr(
                "(1000000L * (n_days * sxy - sx * sy)) div (n_days * sxx - sx * sx)"
            ).alias("slope_micro"),
        ).collect()
    }
    assert out == {"up": 3_000_000, "down": -2_000_000}


def test_ewma_wide_window_no_int_shift_wrap(spark):
    """window > 32 must use 64-bit weights (an INT shift would wrap
    mod 32): a single point's self-weight is 2^(w-1)/(2^w - 1)."""
    r = spark.createDataFrame([("a", 0, 3)], "k string, t long, x long")
    got = ewma_rollup(r, ["k"], "t", "x", window=33).collect()[0]
    M = 1_000_000
    assert got.ewma_micro == (M * (1 << 32) * 3) // ((1 << 33) - 1)
    import pytest

    with pytest.raises(ValueError):
        ewma_rollup(r, ["k"], "t", "x", window=63)


def test_seasonal_decompose_matches_local_replay(spark):
    """seasonal_decompose: full-frame rows only; trend/seasonal/resid
    equal an exact integer local replay, including a gap that shrinks
    the RANGE frame and negative detrended values."""
    from xesmf_spark.timeseries import seasonal_decompose

    # key "a": buckets 0..8 with a gap at 5 (frame of 4 and 6 shrinks)
    vals = {0: 10, 1: 20, 2: 7, 3: 40, 4: 9, 6: 30, 7: 8, 8: 25}
    rows = [("a", t, v) for t, v in vals.items()]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        (row["k"], row["t"]): (
            row["trend_micro"],
            row["seasonal_micro"],
            row["resid_micro"],
        )
        for row in seasonal_decompose(r, ["k"], "t", "x", period=3).collect()
    }
    M = 1_000_000

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    trend, det = {}, {}
    for t in vals:
        frame = [vals[u] for u in vals if t - 1 <= u <= t + 1]
        if len(frame) == 3:
            trend[t] = trunc_div(M * sum(frame), 3)
            det[t] = M * vals[t] - trend[t]
    seas = {}
    for p in range(3):
        ds = [d for t, d in det.items() if t % 3 == p]
        if ds:
            seas[p] = trunc_div(sum(ds), len(ds))
    exp = {
        ("a", t): (trend[t], seas[t % 3], det[t] - seas[t % 3]) for t in trend
    }
    assert got == exp
    assert any(v < 0 for _, (_, _, v) in got.items()) or any(
        d < 0 for d in det.values()
    )  # the negative-division path is actually exercised
    import pytest

    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(r, ["k"], "t", "x", period=4)


def test_cusum_changepoint_finds_level_shift(spark):
    """cusum_changepoints: a clean level shift peaks |CUSUM| at the
    last bucket of the first regime; ties break to the earliest
    bucket; values match the integer replay."""
    from xesmf_spark.timeseries import cusum_changepoints

    series = [10, 10, 10, 10, 30, 30, 30, 30]
    rows = [("a", t, v) for t, v in enumerate(series)]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = cusum_changepoints(r, ["k"], "t", "x").collect()
    assert len(got) == 1
    row = got[0]
    M = 1_000_000
    mean = (M * sum(series)) // len(series)  # positive -> // == div
    cus, best = 0, None
    for t, v in enumerate(series):
        cus += M * v - mean
        if best is None or abs(cus) > abs(best[1]):
            best = (t, cus)
    assert (row["cp_bucket"], row["cusum_micro"], row["n_buckets"]) == (
        best[0],
        best[1],
        len(series),
    )
    assert row["cp_bucket"] == 3  # last pre-shift bucket


def test_acf_matches_local_replay_including_gaps(spark):
    """acf: equals an exact integer local replay (truncating divisions,
    pairs only where both buckets exist, variance over all buckets);
    a perfectly alternating series gives strongly negative lag-1 and
    positive lag-2 autocorrelation."""
    from xesmf_spark.timeseries import acf

    vals = {0: 10, 1: 30, 2: 10, 3: 30, 4: 10, 6: 30, 7: 10}  # gap at 5
    rows = [("a", t, v) for t, v in vals.items()]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        (row["k"], row["lag"]): (row["acf_milli"], row["n_pairs"])
        for row in acf(r, ["k"], "t", "x", max_lag=2).collect()
    }

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    mean = trunc_div(sum(vals.values()), len(vals))
    dev = {t: v - mean for t, v in vals.items()}
    var = sum(d * d for d in dev.values())
    exp = {}
    for lag in (1, 2):
        pairs = [(t, t + lag) for t in vals if t + lag in vals]
        cov = sum(dev[a] * dev[b] for a, b in pairs)
        exp[("a", lag)] = (trunc_div(1000 * cov, var), len(pairs))
    assert got == exp
    # alternation: strongly negative lag-1, positive lag-2 (damped by
    # the calendar gap and the short series)
    assert got[("a", 1)][0] < -500 and got[("a", 2)][0] > 0
    import pytest

    with pytest.raises(ValueError, match="max_lag"):
        acf(r, ["k"], "t", "x", max_lag=0)


def test_mad_anomalies_exact_integer_pinning(spark):
    """mad_anomalies_exact: med2/mad4 are the doubled medians as exact
    integers; the flag is a pure integer compare equal to the float
    |x-med| > n*MAD rule."""
    from xesmf_spark.timeseries import mad_anomalies_exact

    series = [10, 11, 12, 13, 100]  # 100 is the outlier; n=5 odd
    rows = [("a", t, v) for t, v in enumerate(series)]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    out = {
        row["t"]: (row["med2"], row["mad4"], row["is_anomaly"])
        for row in mad_anomalies_exact(r, ["k"], "x", n_sigmas=3).collect()
    }
    import statistics

    med = statistics.median(series)
    mad = statistics.median([abs(v - med) for v in series])
    for t, v in enumerate(series):
        med2, mad4, flag = out[t]
        assert med2 == round(2 * med) and mad4 == round(4 * mad)
        assert flag == (abs(v - med) > 3 * mad)
    assert out[4][2] and not any(out[t][2] for t in range(4))

    # even count: both medians land on halves, still exact
    r2 = spark.createDataFrame(
        [("b", t, v) for t, v in enumerate([10, 11, 13, 100])],
        "k string, t long, x long",
    )
    row = mad_anomalies_exact(r2, ["k"], "x").collect()[0]
    assert row["med2"] == 2 * 12  # median 12.0 of (11,13)


def test_interpolate_gaps_linear_integer(spark):
    """interpolate_gaps: filled values equal the exact truncating
    linear interpolation, including a negative slope; originals pass
    through flagged False; no fill outside the observed range."""
    from xesmf_spark.timeseries import interpolate_gaps

    rows = [("a", 0, 100), ("a", 4, 20), ("a", 6, 26)]
    r = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        (row["k"], row["t"]): (row["x"], row["is_interpolated"])
        for row in interpolate_gaps(r, ["k"], "t", "x").collect()
    }

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    exp = {("a", t): (v, False) for _, t, v in rows}
    for t in (1, 2, 3):  # 100 -> 20 over 4 steps, slope -20
        exp[("a", t)] = (100 + trunc_div((20 - 100) * t, 4), True)
    exp[("a", 5)] = (20 + trunc_div((26 - 20) * 1, 2), True)
    assert got == exp
    assert got[("a", 1)] == (80, True) and got[("a", 5)] == (23, True)


def test_theilsen_robust_to_spike_and_matches_replay(spark):
    """theilsen_slope: equals the exact local replay; a single spike
    barely moves the Theil-Sen slope while it wrecks the OLS slope;
    the max_buckets valve drops oversized keys whole."""
    import statistics

    from xesmf_spark.timeseries import theilsen_slope

    clean = [("a", t, 10 * t + 3) for t in range(10)]
    spiked = [("b", t, 10 * t + 3 + (100_000 if t == 5 else 0)) for t in range(10)]
    r = spark.createDataFrame(clean + spiked, "k string, t long, x long")
    got = {
        row["k"]: (row["slope_med2_micro"], row["n_pairs"])
        for row in theilsen_slope(r, ["k"], "t", "x").collect()
    }

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def replay(rows):
        pts = [(t, x) for _, t, x in rows]
        slopes = [
            trunc_div(1_000_000 * (x2 - x1), t2 - t1)
            for i, (t1, x1) in enumerate(pts)
            for (t2, x2) in pts[i + 1 :]
        ]
        return round(2 * statistics.median(slopes)), len(slopes)

    assert got["a"] == replay(clean) == (2 * 10_000_000, 45)
    assert got["b"] == replay(spiked)
    # robust: the spiked slope stays within 2x of the true slope
    assert abs(got["b"][0] / 2 - 10_000_000) < 10_000_000
    # valve: keys above the bound vanish
    assert theilsen_slope(r, ["k"], "t", "x", max_buckets=5).count() == 0


def test_acf_constant_series_key_dropped_not_null(spark):
    """r13 ADVICE: a constant series has zero variance and an undefined
    ACF — the key is DROPPED (mirrors the oracle's WHERE var > 0),
    never emitted with NULL acf_milli."""
    from xesmf_spark.timeseries import acf

    rows = [("flat", t, 500) for t in range(10)] + [
        ("varies", t, 100 * (t % 3)) for t in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, bucket long, v long")
    out = acf(df, key_cols=["k"], bucket_col="bucket", val_col="v", max_lag=2).collect()
    assert {r.k for r in out} == {"varies"}
    assert all(r.acf_milli is not None for r in out)


def test_holt_smooth_matches_python_fold_and_valve(spark):
    """Holt recursion: engine output equals a literal Python integer
    fold (same truncating divisions) for a trending series with a
    spike; n=1 and n=2 edge keys; the max_buckets valve raises."""
    import pytest as _pytest

    from xesmf_spark.timeseries import holt_smooth

    xs = [100, 130, 160, 190, 400, 250, 280, 310]
    rows = [("k", t, x) for t, x in enumerate(xs)]
    rows += [("one", 0, 500)]
    rows += [("two", 0, 10), ("two", 1, 30)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = {
        (r.k, r.h): r
        for r in holt_smooth(
            df, ["k"], "t", "x", alpha_milli=300, beta_milli=100, horizon=2
        ).collect()
    }

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    l, b = 1000 * xs[0], 1000 * (xs[1] - xs[0])
    for x in xs[1:]:
        nl = tdiv(300 * 1000 * x + 700 * (l + b), 1000)
        b = tdiv(100 * (nl - l) + 900 * b, 1000)
        l = nl
    assert out[("k", 1)].level_milli == l and out[("k", 1)].trend_milli == b
    assert out[("k", 2)].forecast_milli == l + 2 * b
    assert out[("k", 1)].n_buckets == 8
    # n=1: trend 0, forecast = level
    assert out[("one", 1)].trend_milli == 0
    assert out[("one", 1)].forecast_milli == out[("one", 1)].level_milli == 500000
    # n=2: init consumes x2 in both b1 and the t=2 step
    l2, b2 = 1000 * 10, 1000 * 20
    nl = tdiv(300 * 1000 * 30 + 700 * (l2 + b2), 1000)
    nb = tdiv(100 * (nl - l2) + 900 * b2, 1000)
    assert out[("two", 1)].level_milli == nl and out[("two", 1)].trend_milli == nb

    with _pytest.raises(Exception, match="max_buckets"):
        holt_smooth(df, ["k"], "t", "x", max_buckets=3).collect()


def test_cross_correlation_detects_planted_lead(spark):
    """CCF contract: with B = A shifted by +2 buckets (plus offset),
    the lag-2 beta dominates and equals ~1000 milli (B moves 1:1 with
    A two buckets later); pairs shrink by |lag|; constant A yields no
    rows (variance filter)."""
    from xesmf_spark.timeseries import cross_correlation

    xs = [100, 400, 150, 900, 200, 700, 300, 800, 100, 600]
    a = spark.createDataFrame(
        [(t, x) for t, x in enumerate(xs)], "day long, cents long"
    )
    b = spark.createDataFrame(
        [(t + 2, x + 50) for t, x in enumerate(xs)], "day long, cents long"
    )
    out = {r.lag: r for r in cross_correlation(a, b, "day", "cents", max_lag=3).collect()}
    assert out[2].beta_milli == max(r.beta_milli for r in out.values())
    # B(t+2) = A(t) + 50: identical devs on the 10 overlapping pairs
    # minus mean-shift noise from edge buckets -> beta close to 1000
    assert 900 <= out[2].beta_milli <= 1100, out[2]
    assert out[3].n_pairs < out[2].n_pairs <= 10
    flat = spark.createDataFrame([(t, 5) for t in range(10)], "day long, cents long")
    assert cross_correlation(flat, b, "day", "cents").count() == 0


def test_holt_magnitude_gate_raises(spark):
    """|value| past 9e12 must raise loudly (the recursion's
    alpha*1000*x term would wrap BIGINT silently under non-ANSI Spark
    while the DuckDB replay computes in HUGEINT)."""
    import pytest as _pytest

    from xesmf_spark.timeseries import holt_smooth

    df = spark.createDataFrame(
        [("k", 0, 10_000_000_000_000), ("k", 1, 5)], "k string, t long, x long"
    )
    with _pytest.raises(Exception, match="9e12"):
        holt_smooth(df, ["k"], "t", "x").collect()
