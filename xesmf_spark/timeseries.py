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


def seasonal_decompose(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition over rollup state:

        trend_micro(t)    = (1e6 * SUM(x) over [t-h, t+h]) div period
        detrended(t)      = 1e6*x(t) - trend_micro(t)
        seasonal_micro(p) = SUM(detrended where phase=p) div COUNT(..)
        resid_micro(t)    = detrended(t) - seasonal_micro(phase(t))

    with ``h = (period-1)//2`` (``period`` must be odd so the moving
    average is centered) and ``phase = bucket % period``.  The trend
    frame is a RANGE window on the integer bucket, so calendar gaps
    shrink the frame; rows whose frame holds fewer than ``period``
    buckets get no trend and are excluded from both the seasonal means
    and the output — the deterministic boundary rule a SQL replay
    states verbatim (COUNT(*) OVER the same frame = period).

    Exactness: all terms are BIGINT; the two divisions truncate toward
    zero in BOTH engines (Spark ``div`` and DuckDB ``//`` agree on
    negative operands — verified, unlike SQL-standard FLOOR division),
    so detrended/seasonal/resid are bit-identical under replay even
    where detrending goes negative.  Seasonal indices are uncentered
    per-phase means (documented; centering adds one more scalar join
    without changing determinism).

    Scale shape: ONE per-key RANGE window over the rollup state + one
    (key, phase)-grouped mean joined back on (key, phase) — cost is
    O(state), never raw-event-shaped; no driver scalars.  Output:
    keys + bucket + ``trend_micro, seasonal_micro, resid_micro``."""
    from pyspark.sql import Window

    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = (period - 1) // 2
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bucket_col).cast("long"))
        .rangeBetween(-half, half)
    )
    x = (F.col(val_col).cast("long") * F.lit(M)).alias("__x")
    t = rollup.select(
        *key_cols,
        F.col(bucket_col),
        x,
        F.sum(F.col(val_col).cast("long") * F.lit(M)).over(w).alias("__fsum"),
        F.count(F.lit(1)).over(w).alias("__fn"),
    ).filter(F.col("__fn") == period)
    t = t.select(
        *key_cols,
        bucket_col,
        "__x",
        F.expr(f"__fsum div {period}L").alias("trend_micro"),
        (F.col(bucket_col).cast("long") % period).alias("__phase"),
    ).withColumn("__det", F.col("__x") - F.col("trend_micro"))
    seas = t.groupBy(*key_cols, "__phase").agg(
        F.expr("sum(__det) div count(1)").alias("seasonal_micro")
    )
    return t.join(seas, [*key_cols, "__phase"]).select(
        *key_cols,
        bucket_col,
        "trend_micro",
        "seasonal_micro",
        (F.col("__det") - F.col("seasonal_micro")).alias("resid_micro"),
    )


def cusum_changepoints(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
) -> DataFrame:
    """CUSUM changepoint locator per key: with the per-key mean pinned
    to ``mean_micro = SUM(1e6*x) div n``, the cumulative sum of
    deviations ``S(t) = Σ_{i<=t} (1e6*x(i) - mean_micro)`` peaks (in
    absolute value) at the most likely single shift point of the
    series — the classic offline CUSUM statistic (Page 1954).  Returns
    one row per key: the argmax bucket (ties -> earliest bucket), the
    signed CUSUM there, and the series length.

    Exactness: every term is BIGINT; the single division truncates
    toward zero identically in Spark (``div``) and DuckDB (``//``),
    including negative-mean series, so S(t) and the argmax are
    engine-exact with no float anywhere.

    Scale shape: one per-key scalar agg joined back (map-side
    combinable), one per-key ordered cumulative-sum window, one
    row_number argmax window — all over O(state) rollup rows, never
    raw events; no driver scalars.  Output:
    keys + ``cp_bucket, cusum_micro, n_buckets``."""
    from pyspark.sql import Window

    x = (F.col(val_col).cast("long") * F.lit(M)).alias("__x")
    stats = rollup.groupBy(*key_cols).agg(
        F.expr(f"sum(cast({val_col} as long) * {M}L) div count(1)").alias(
            "__mean"
        ),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bucket_col).cast("long"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        rollup.select(*key_cols, bucket_col, x)
        .join(stats, key_cols)
        .withColumn(
            "cusum_micro", F.sum(F.col("__x") - F.col("__mean")).over(wcum)
        )
    )
    warg = Window.partitionBy(*key_cols).orderBy(
        F.abs(F.col("cusum_micro")).desc(), F.col(bucket_col).asc()
    )
    return (
        cum.withColumn("__rn", F.row_number().over(warg))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col(bucket_col).alias("cp_bucket"),
            "cusum_micro",
            "n_buckets",
        )
    )


def cross_correlation(
    a: DataFrame,
    b: DataFrame,
    bucket_col: str,
    val_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """LEAD-LAG cross-correlation between two (bucket, value) series —
    the two-series twin of :func:`acf` and the question ACF cannot
    answer ("does series A lead series B, and by how much?"):

        beta_milli(l) = (1000 · Σ_t devA(t)·devB(t+l)) div Σ_t devA(t)²

    for l in −``max_lag``..+``max_lag`` — the lag-l regression
    coefficient of B on A (POSITIVE l = A leads B by l buckets).  The
    β normalization (devA variance) keeps every term an exact
    truncating BIGINT — the Pearson-style √(varA·varB) normalizer
    would force an inexact square root; callers wanting the symmetric
    CCF can run the op twice and geometric-mean downstream.  Overflow
    bound (the :func:`acf` milli-lift discipline): 1000·Σ devA·devB
    must stay inside BIGINT — cents-scale devs with ≤ ~1e5 buckets
    keep the numerator ≤ ~1e17 with headroom; rescale units upstream
    for larger magnitudes (Spark's non-ANSI sum would wrap silently
    where the DuckDB replay's HUGEINT doesn't).  Pairs
    exist where both buckets exist (calendar gaps shrink that lag's
    pair set, stated verbatim by the replay); the variance denominator
    uses ALL of A's buckets; zero-variance A raises nothing — it is
    dropped like :func:`acf`'s constant keys.

    Scale shape: two scalar mean join-backs, ONE bucket-keyed
    equi-join of A's deviations against B's lag-exploded deviations
    (state × (2·max_lag+1) rows — never raw volume), two
    map-side-combinable SUMs.  Output: ``(lag, beta_milli,
    n_pairs)``."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")

    def _dev(df, name):
        stats = df.agg(
            F.expr(f"sum(cast({val_col} as long)) div count(1)").alias("__m")
        )
        return (
            df.crossJoin(F.broadcast(stats))
            .select(
                F.col(bucket_col).cast("long").alias("__t"),
                (F.col(val_col).cast("long") - F.col("__m")).alias(name),
            )
        )

    da = _dev(a, "__da")
    db = _dev(b, "__db")
    var = da.agg(F.sum(F.col("__da") * F.col("__da")).alias("__var")).filter(
        F.col("__var") > 0
    )
    right = db.select(
        F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))).alias("lag"),
        (F.col("__t") - F.col("lag")).alias("__t"),
        F.col("__db").alias("__db_r"),
    )
    return (
        da.join(right, "__t")
        .groupBy("lag")
        .agg(
            F.sum(F.col("__da") * F.col("__db_r")).alias("__cov"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .crossJoin(F.broadcast(var))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.expr("(1000L * __cov) div __var").alias("beta_milli"),
            "n_pairs",
        )
    )


def acf(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Sample AUTOCORRELATION function per key at lags ``1..max_lag``
    over rollup state:

        acf_milli(l) = (1000 · Σ_t dev(t)·dev(t+l)) div Σ_t dev(t)²

    with ``dev(t) = x(t) − mean`` and ``mean = SUM(x) div n`` — the
    standard sample ACF, every term exact BIGINT (milli, not micro:
    dev² sums approach 1e14 on cents-scale rollups, so the 1e6 lift
    would overflow the final numerator; the 1000 lift keeps
    1000·cov ≤ ~1e17 with headroom — the lineitem_correlations
    pre-scaling discipline, bound documented here).  Negative
    covariances divide identically in both engines (truncation toward
    zero).  Lag pairs exist where BOTH buckets exist — calendar gaps
    shrink the pair set for that lag, stated verbatim by the SQL
    replay; the variance denominator uses ALL buckets.

    Scale shape: one scalar agg join-back, ONE keyed equi-join of the
    state against its lag-exploded self (state × max_lag rows — never
    raw volume), two map-side-combinable SUMs.  Output:
    keys + ``(lag, acf_milli, n_pairs)``."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    stats = rollup.groupBy(*key_cols).agg(
        F.expr(f"sum(cast({val_col} as long)) div count(1)").alias("__mean")
    )
    dev = (
        rollup.join(stats, key_cols)
        .select(
            *key_cols,
            F.col(bucket_col).cast("long").alias("__t"),
            (F.col(val_col).cast("long") - F.col("__mean")).alias("__dev"),
        )
    )
    # constant series have zero variance and an undefined ACF: drop the
    # key (r13 ADVICE — Spark non-ANSI div NULLs, DuckDB // 0 errors;
    # the filter is the one semantic both engines state identically)
    var = dev.groupBy(*key_cols).agg(
        F.sum(F.col("__dev") * F.col("__dev")).alias("__var")
    ).filter(F.col("__var") > 0)
    right = dev.select(
        *key_cols,
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
        F.col("__t"),
        F.col("__dev").alias("__dev_r"),
    ).select(
        *key_cols, "lag", (F.col("__t") - F.col("lag")).alias("__t"), "__dev_r"
    )
    pairs = dev.join(right, [*key_cols, "__t"])
    return (
        pairs.groupBy(*key_cols, "lag")
        .agg(
            F.sum(F.col("__dev") * F.col("__dev_r")).alias("__cov"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .join(var, key_cols)
        .select(
            *key_cols,
            "lag",
            F.expr("(1000L * __cov) div __var").alias("acf_milli"),
            "n_pairs",
        )
    )


def mad_anomalies_exact(
    rollup: DataFrame,
    key_cols: list[str],
    val_col: str,
    n_sigmas: int = 3,
) -> DataFrame:
    """Integer-PINNED median/MAD anomaly flags for BIGINT-valued
    rollups — the exact twin of :func:`mad_anomalies` for magnitudes
    where doubles betray the replay: at ~1e11+ the two engines'
    interpolated MEDIANs differ by one ULP (~1e-4 — measured on
    micro-cent residuals; ROUND(..., 6) cannot absorb that), so this
    op never compares raw medians.  Medians of integers land on exact
    halves, therefore

        med2 = ROUND(2 · median(x))          -- exact integer
        dev2 = |2·x − med2|                  -- exact BIGINT
        mad4 = ROUND(2 · median(dev2))       -- exact integer (4·MAD)
        anomaly  ⇔  2·dev2 > n_sigmas·mad4   -- pure integer compare

    (|x−med| > n·MAD ⇔ dev2/2 > n·mad4/4 ⇔ 2·dev2 > n·mad4).  The
    ROUND eats each engine's ULP noise; everything after is BIGINT.

    Scale shape: identical to :func:`mad_anomalies` — two grouped
    medians + two state-keyed joins, all on rollup state.  Output:
    the rollup's columns + ``med2, mad4, is_anomaly``."""
    x2 = (F.col(val_col).cast("long") * 2).alias("__x2")
    meds = rollup.groupBy(*key_cols).agg(
        F.round(F.expr(f"2 * median(cast({val_col} as long))"))
        .cast("long")
        .alias("med2")
    )
    with_med = rollup.join(meds, key_cols).withColumn(
        "__dev2", F.abs(F.col(val_col).cast("long") * 2 - F.col("med2"))
    )
    mads = with_med.groupBy(*key_cols).agg(
        F.round(F.expr("2 * median(__dev2)")).cast("long").alias("mad4")
    )
    return (
        with_med.join(mads, key_cols)
        .select(
            *rollup.columns,
            "med2",
            "mad4",
            (
                F.lit(2) * F.col("__dev2")
                > F.lit(int(n_sigmas)) * F.col("mad4")
            ).alias("is_anomaly"),
        )
    )


def interpolate_gaps(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
) -> DataFrame:
    """Fill missing integer buckets between each key's first and last
    observation by LINEAR interpolation in exact integer arithmetic:

        v(t) = v0 + ((v1 − v0) · (t − t0)) div (t1 − t0)

    for a gap between present buckets t0 < t < t1 — the
    gap-repair rung between zero-fill (events_hourly_gapfill) and
    model-based imputation; truncating division keeps every filled
    value BIGINT and engine-identical (negative slopes truncate the
    same in Spark ``div`` and DuckDB ``//``).

    Scale shape: one per-key LEAD window over rollup state + one
    bounded sequence explode (gap-sized, between consecutive PRESENT
    rows only — never a dense calendar cross join), unioned with the
    originals.  Output: keys + bucket + ``val_col`` +
    ``is_interpolated``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col("__t"))
    base = rollup.select(
        *key_cols,
        F.col(bucket_col).cast("long").alias("__t"),
        F.col(val_col).cast("long").alias("__v"),
    )
    with_next = base.select(
        *key_cols,
        "__t",
        "__v",
        F.lead("__t").over(w).alias("__t1"),
        F.lead("__v").over(w).alias("__v1"),
    )
    filled = (
        with_next.filter(
            F.col("__t1").isNotNull() & (F.col("__t1") - F.col("__t") > 1)
        )
        .select(
            *key_cols,
            "__t",
            "__v",
            "__t1",
            "__v1",
            F.explode(
                F.sequence(F.col("__t") + 1, F.col("__t1") - 1)
            ).alias("__tm"),
        )
        .select(
            *key_cols,
            F.col("__tm").alias(bucket_col),
            F.expr("__v + ((__v1 - __v) * (__tm - __t)) div (__t1 - __t)").alias(
                val_col
            ),
            F.lit(True).alias("is_interpolated"),
        )
    )
    originals = base.select(
        *key_cols,
        F.col("__t").alias(bucket_col),
        F.col("__v").alias(val_col),
        F.lit(False).alias("is_interpolated"),
    )
    return originals.unionByName(filled)


def holt_smooth(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    alpha_milli: int = 300,
    beta_milli: int = 100,
    horizon: int = 3,
    max_buckets: int = 100_000,
) -> DataFrame:
    """HOLT double-exponential smoothing (level + linear trend) per key
    — the forecasting rung above :func:`ewma` (no trend) and below a
    full seasonal method (pair with :func:`seasonal_decompose` for
    that): with milli-fraction weights α, β and the classic init
    l₁ = x₁, b₁ = x₂ − x₁,

        l_t = (α·1000·x_t + (1000−α)·(l_{t−1} + b_{t−1})) div 1000
        b_t = (β·(l_t − l_{t−1}) + (1000−β)·b_{t−1}) div 1000

    every step an exact truncating BIGINT op (state carried in milli
    units), so the final level/trend — and the h-step forecasts
    ``l_n + h·b_n`` — are bit-identical on both engines (the recursion
    replays as a DuckDB RECURSIVE CTE).  Buckets are consumed in sort
    order; calendar gaps count as single steps (run
    :func:`interpolate_gaps` first for calendar-true smoothing —
    documented composition, not hidden resampling).

    Scale shape: smoothing is inherently SEQUENTIAL per key, so the
    series is collected per key into one array (state-shaped: rollup
    rows, never raw volume) and folded with one ``aggregate`` — keys
    parallelize, the fold is linear.  ``max_buckets`` is the loud
    valve: a key whose state exceeds it raises (collecting an
    unbounded series into one row is the failure mode this guards).
    Output: keys + ``(n_buckets, level_milli, trend_milli, h,
    forecast_milli)``, one row per horizon step 1..``horizon``."""
    if not 0 <= alpha_milli <= 1000 or not 0 <= beta_milli <= 1000:
        raise ValueError(
            f"alpha_milli/beta_milli must be in [0, 1000], got "
            f"{alpha_milli}/{beta_milli}"
        )
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    arr = (
        rollup.select(
            *key_cols,
            F.col(bucket_col).cast("long").alias("__t"),
            # α·1000·x must stay inside BIGINT (Spark non-ANSI multiply
            # wraps silently where the DuckDB replay's HUGEINT doesn't):
            # |x| ≤ 9e12 keeps every recursion term ≤ ~2.7e18 with
            # headroom for the (l + b) state — gate loudly past it
            F.expr(
                f"CASE WHEN abs(CAST({val_col} AS BIGINT)) > 9000000000000 "
                f"THEN CAST(raise_error('holt_smooth: |value| exceeds the "
                f"BIGINT-exact bound (9e12) — rescale units upstream') "
                f"AS BIGINT) ELSE CAST({val_col} AS BIGINT) END"
            ).alias("__x"),
        )
        .groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__t").alias("t"), F.col("__x").alias("x")))
            ).alias("__arr")
        )
        .select(
            *key_cols,
            F.expr(
                f"CASE WHEN size(__arr) > {max_buckets} THEN "
                f"CAST(raise_error('holt_smooth: series exceeds max_buckets="
                f"{max_buckets} state rows — aggregate to a coarser rollup') "
                f"AS ARRAY<STRUCT<t: BIGINT, x: BIGINT>>) ELSE __arr END"
            ).alias("__arr"),
        )
    )
    a, b = alpha_milli, beta_milli
    # init l1 = x1, b1 = x2 - x1; recursion folds over x2..xn (x2 is
    # consumed by BOTH init and the t=2 step — the standard Holt init).
    # b_t needs l_t, so the l_t expression is inlined twice (the same
    # repetition the RECURSIVE-CTE oracle states).
    fold = (
        f"aggregate("
        f"  slice(__arr, 2, greatest(size(__arr) - 1, 0)),"
        f"  named_struct("
        f"    'l', 1000L * __arr[0].x,"
        f"    'b', CASE WHEN size(__arr) >= 2"
        f"         THEN 1000L * (__arr[1].x - __arr[0].x) ELSE 0L END),"
        f"  (acc, e) -> named_struct("
        f"    'l', ({a}L * 1000L * e.x + {1000 - a}L * (acc.l + acc.b)) div 1000,"
        f"    'b', ({b}L * ((({a}L * 1000L * e.x + {1000 - a}L * (acc.l + acc.b))"
        f"      div 1000) - acc.l) + {1000 - b}L * acc.b) div 1000))"
    )
    state = arr.select(
        *key_cols,
        F.size("__arr").cast("long").alias("n_buckets"),
        F.expr(fold).alias("__s"),
    ).select(
        *key_cols,
        "n_buckets",
        F.col("__s.l").alias("level_milli"),
        F.col("__s.b").alias("trend_milli"),
    )
    return state.select(
        *key_cols,
        "n_buckets",
        "level_milli",
        "trend_milli",
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
    ).select(
        *key_cols,
        "n_buckets",
        "level_milli",
        "trend_milli",
        F.col("h").cast("long").alias("h"),
        (F.col("level_milli") + F.col("h") * F.col("trend_milli")).alias(
            "forecast_milli"
        ),
    )


def theilsen_slope(
    rollup: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    val_col: str,
    max_buckets: int | None = 2000,
) -> DataFrame:
    """Theil-Sen ROBUST trend slope per key — the median of all
    pairwise slopes, the estimator a single spike cannot drag the way
    it drags OLS (events_trend_slope's integer least squares):

        slope(i,j) = (1e6·(x_j − x_i)) div (t_j − t_i)   for t_i < t_j
        slope_med2 = ROUND(2 · median(slopes))           -- exact BIGINT

    Slopes are micro-lifted truncating BIGINT divisions (negative
    slopes truncate identically both engines); the median is pinned by
    the med2 doubling (engine medians drift a ULP at large magnitudes
    — the :func:`mad_anomalies_exact` discipline), so the reported
    2×-slope is an exact integer.

    Scale shape: ONE key-equi self-join of the rollup state against
    itself (per-key quadratic: B buckets → B²/2 pairs — STATE-shaped,
    never raw volume; the classic Theil-Sen cost).  ``max_buckets``
    is the skew valve: keys with more state rows than the bound are
    EXCLUDED whole (emitted nowhere — run on a coarser rollup
    instead), the editdist/record-linkage valve contract.  Output:
    keys + ``(slope_med2_micro, n_pairs)``."""
    b = rollup.select(
        *key_cols,
        F.col(bucket_col).cast("long").alias("__t"),
        F.col(val_col).cast("long").alias("__x"),
    )
    if max_buckets is not None:
        sz = b.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__bn"))
        b = (
            b.join(sz, key_cols)
            .filter(F.col("__bn") <= max_buckets)
            .drop("__bn")
        )
    left = b.select(
        *key_cols, F.col("__t").alias("__t1"), F.col("__x").alias("__x1")
    )
    right = b.select(
        *key_cols, F.col("__t").alias("__t2"), F.col("__x").alias("__x2")
    )
    pairs = left.join(right, key_cols).filter(F.col("__t1") < F.col("__t2"))
    slopes = pairs.select(
        *key_cols,
        F.expr("(1000000L * (__x2 - __x1)) div (__t2 - __t1)").alias("__s"),
    )
    return slopes.groupBy(*key_cols).agg(
        F.round(F.expr("2 * median(__s)")).cast("long").alias("slope_med2_micro"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
