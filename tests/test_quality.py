from pyspark.sql import functions as F  # noqa: F401

from xesmf_spark.quality import (
    check_constraints,
    histogram_quantile,
    histogram_rollup,
    profile_table,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k long, s string"
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_rows == 4
    assert got["k"].null_count == 1
    assert got["k"].n_distinct == 2
    assert (got["k"].min_value, got["k"].max_value) == ("1", "2")
    assert got["s"].null_count == 1
    assert got["s"].n_distinct == 2
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")


def test_check_constraints_nulls_are_violations(spark):
    """NULL rule results count as violations (three-valued logic),
    and a fully-passing rule reports ok=True."""
    df = spark.createDataFrame(
        [(1,), (5,), (None,)], "v long"
    )
    out = {
        r.rule: (r.n_rows, r.n_violations, r.ok)
        for r in check_constraints(
            df, {"v_small": "v <= 5", "v_present": "v IS NOT NULL"}
        ).collect()
    }
    assert out["v_small"] == (3, 1, False)  # NULL <= 5 is NULL -> violation
    assert out["v_present"] == (3, 1, False)
    ok = check_constraints(df.filter("v IS NOT NULL"), {"v_small": "v <= 5"})
    assert ok.collect()[0].ok is True


def test_histogram_bins_clamp_and_merge(spark):
    """Out-of-range values clamp to the edge bins; two partial
    histograms merged by bin-sum equal the whole-input histogram (the
    mergeable-monoid contract)."""
    rows1 = [("g", v) for v in [-5, 1, 3, 7, 12]]
    rows2 = [("g", v) for v in [7, 99]]
    d1 = spark.createDataFrame(rows1, "k string, v long")
    d2 = spark.createDataFrame(rows2, "k string, v long")
    h = lambda d: histogram_rollup(d, ["k"], "v", lo=1, width=5, nbins=3)  # noqa: E731
    whole = {(r.bin): r.n for r in h(d1.unionByName(d2)).collect()}
    merged = {}
    for d in (d1, d2):
        for r in h(d).collect():
            merged[r.bin] = merged.get(r.bin, 0) + r.n
    assert merged == whole
    assert whole == {0: 3, 1: 2, 2: 2}  # -5,1,3 | 7,7 | 12,99 (clamped)


def test_histogram_quantile_first_bin_rule(spark):
    """Median = lower bound of the first bin whose cumulative count
    reaches half the total."""
    rows = [("g", 1)] * 3 + [("g", 6)] * 2 + [("g", 11)] * 5
    d = spark.createDataFrame(rows, "k string, v long")
    hist = histogram_rollup(d, ["k"], "v", lo=1, width=5, nbins=3)
    q = histogram_quantile(hist, ["k"], 500_000, lo=1, width=5).collect()[0]
    assert (q.q_bin, q.q_value) == (1, 6)  # cum 3,5,10; 5*1e6 >= .5*10e6
    q9 = histogram_quantile(hist, ["k"], 900_000, lo=1, width=5).collect()[0]
    assert (q9.q_bin, q9.q_value) == (2, 11)


def test_inverted_index_bounded_postings(spark):
    from xesmf_spark.search import inverted_index

    docs = spark.createDataFrame(
        [(i, "x common") if i < 7 else (i, "y common") for i in range(9)],
        "doc_id long, text string",
    )
    got = {r.term: r for r in inverted_index(docs, sample_k=5).collect()}
    assert got["common"].df == 9
    assert got["common"].total_tf == 9
    assert got["common"].postings_sample == [0, 1, 2, 3, 4]  # bounded + sorted
    assert got["x"].postings_sample == [0, 1, 2, 3, 4]
    assert got["y"].postings_sample == [7, 8]


def test_check_constraints_free_text_rule_names(spark):
    """Rule names are labels, not identifiers — spaces and hyphens
    must not break the plan."""
    df = spark.createDataFrame([(1,), (9,)], "v long")
    out = {
        r.rule: r.n_violations
        for r in check_constraints(
            df, {"v small-ish (le 5)": "v <= 5", "v present": "v IS NOT NULL"}
        ).collect()
    }
    assert out == {"v small-ish (le 5)": 1, "v present": 0}


def test_check_constraints_empty_input_reports_zero_violations(spark):
    """A vacuous audit PASSES: SUM over zero rows is NULL in SQL, so
    without coalesce an empty input reported NULL n_violations and
    NULL ok — neither pass nor fail. It must report 0 / ok=true."""
    df = spark.createDataFrame([], "v long")
    rows = check_constraints(df, {"v_small": "v <= 5"}).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_rows, r.n_violations, r.ok) == (0, 0, True)


def test_psi_drift_matches_brute_force(spark):
    import math

    from xesmf_spark.quality import psi_drift

    base_vals = [5, 15, 15, 25, 25, 25, 95, -3]   # clamps: -3 -> bin 0, 95 -> bin 9
    new_vals = [5, 35, 35, 35, 45, 120]
    nbins, lo, width = 10, 0, 10

    def hist(vals):
        h = [0] * nbins
        for v in vals:
            h[min(max((v - lo) // width, 0), nbins - 1)] += 1
        return h

    hb, hn = hist(base_vals), hist(new_vals)
    want_terms, want_total = [], 0
    for i in range(nbins):
        p = (hb[i] + 1) / (len(base_vals) + nbins)
        q = (hn[i] + 1) / (len(new_vals) + nbins)
        t = math.floor(1_000_000 * ((p - q) * math.log(p / q)))
        want_terms.append((i, hb[i], hn[i], t))
        want_total += t
    out = psi_drift(
        spark.createDataFrame([(v,) for v in base_vals], "cents long"),
        spark.createDataFrame([(v,) for v in new_vals], "cents long"),
        "cents",
        lo=lo,
        width=width,
        nbins=nbins,
    )
    rows = sorted(out.collect(), key=lambda r: r["bin"])
    got = [(r["bin"], r["n_base"], r["n_new"], r["term_micro"]) for r in rows]
    assert got == want_terms
    assert all(r["psi_micro"] == want_total for r in rows)
    # every term is >= 0 ((p-q) and ln(p/q) share sign), up to the
    # floor's -1; identical distributions would give ~0
    assert want_total > 0
    same = psi_drift(
        spark.createDataFrame([(v,) for v in base_vals], "cents long"),
        spark.createDataFrame([(v,) for v in base_vals], "cents long"),
        "cents",
        lo=lo,
        width=width,
        nbins=nbins,
    ).collect()
    assert all(r["psi_micro"] == 0 for r in same)


def test_ks_drift_matches_scipy_style_reference(spark):
    """Two-sample KS: the distributed two-phase scan equals a direct
    dict reference (exact cross-multiplied integers), detects a planted
    location shift, reports ~0 for identical samples, and the argmax
    tie rule is the smallest value."""
    import random

    from xesmf_spark.quality import ks_drift

    rng = random.Random(17)
    a_vals = [rng.randint(0, 1000) for _ in range(400)]
    b_vals = [min(1000, v + 120) for v in (rng.randint(0, 1000) for _ in range(300))]
    a = spark.createDataFrame([(v,) for v in a_vals], "cents long")
    b = spark.createDataFrame([(v,) for v in b_vals], "cents long")

    def ref(xs, ys):
        vs = sorted(set(xs) | set(ys))
        nb, nn = len(xs), len(ys)
        best = (-1, None)
        cb = cn = 0
        from collections import Counter

        cx, cy = Counter(xs), Counter(ys)
        for v in vs:
            cb += cx.get(v, 0)
            cn += cy.get(v, 0)
            d = abs(nn * cb - nb * cn)
            if d > best[0]:
                best = (d, v)
        return nb, nn, best[1], best[0], 1_000_000 * best[0] // (nb * nn)

    row = ks_drift(a, b, "cents", n_buckets=7).collect()[0]
    assert tuple(row) == ref(a_vals, b_vals)
    # shift of ~12% of the range: D must be substantial
    assert row.ks_micro > 100_000
    # identical samples: D == 0
    same = ks_drift(a, a, "cents", n_buckets=7).collect()[0]
    assert same.ks_num == 0 and same.ks_micro == 0
    # bucket count must not change the answer (decomposition exactness)
    assert tuple(ks_drift(a, b, "cents", n_buckets=1).collect()[0]) == ref(
        a_vals, b_vals
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        ks_drift(a.filter("cents < 0"), b, "cents").collect()


def test_w1_drift_matches_direct_reference(spark):
    """Wasserstein-1: the bucketed prefix scan + boundary-stitched gaps
    equal a direct sorted-values reference (exact integers), scale with
    a planted shift, vanish for identical samples, and are invariant to
    the bucket count (gap stitching across bucket edges is the part a
    wrong decomposition would corrupt)."""
    import random

    from xesmf_spark.quality import w1_drift

    rng = random.Random(29)
    a_vals = [rng.randint(0, 1000) for _ in range(400)]
    b_vals = [min(1000, v + 120) for v in (rng.randint(0, 1000) for _ in range(300))]
    a = spark.createDataFrame([(v,) for v in a_vals], "cents long")
    b = spark.createDataFrame([(v,) for v in b_vals], "cents long")

    def ref(xs, ys):
        from collections import Counter

        vs = sorted(set(xs) | set(ys))
        nb, nn = len(xs), len(ys)
        cx, cy = Counter(xs), Counter(ys)
        cb = cn = num = 0
        for v, nxt in zip(vs, vs[1:]):
            cb += cx.get(v, 0)
            cn += cy.get(v, 0)
            num += abs(nn * cb - nb * cn) * (nxt - v)
        d = nb * nn
        micro = 1_000_000 * (num // d) + (1_000_000 * (num % d)) // d
        return nb, nn, num, micro

    row = w1_drift(a, b, "cents", n_buckets=7).collect()[0]
    assert tuple(row) == ref(a_vals, b_vals)
    # the planted +120 shift on a 0..1000 domain: W1 ~ 120 units ->
    # w1_micro ~ 120e6; demand at least half that
    assert row.w1_micro > 60_000_000
    # identical samples: W1 == 0
    same = w1_drift(a, a, "cents", n_buckets=7).collect()[0]
    assert same.w1_num == 0 and same.w1_micro == 0
    # decomposition exactness: 1 bucket (pure in-bucket lead) and many
    # buckets (every gap crosses a boundary) agree with the reference
    for nb_ in (1, 997):
        assert tuple(w1_drift(a, b, "cents", n_buckets=nb_).collect()[0]) == ref(
            a_vals, b_vals
        )


def test_profile_correlations_matches_numpy(spark):
    """profile_correlations: micro-floored Pearson equals numpy's
    corrcoef on the same integer columns; constant columns yield NULL;
    perfectly linear pairs hit ±1e6 within floor dust."""
    import math

    import numpy as np

    from xesmf_spark.quality import profile_correlations

    rng = np.random.RandomState(31)
    n = 300
    a = rng.randint(0, 100, n)
    b = 3 * a + rng.randint(0, 40, n)   # strongly positive
    c = rng.randint(0, 100, n)          # independent
    d = np.full(n, 7)                   # constant -> NULL
    e = -2 * a                          # perfectly linear -> -1
    df = spark.createDataFrame(
        [(int(a[i]), int(b[i]), int(c[i]), int(d[i]), int(e[i])) for i in range(n)],
        "a long, b long, c long, d long, e long",
    )
    got = {
        (r["col_x"], r["col_y"]): (r["n"], r["corr_micro"])
        for r in profile_correlations(df, ["a", "b", "c", "d", "e"]).collect()
    }
    assert len(got) == 10 and all(v[0] == n for v in got.values())

    def ref(x, y):
        xs, ys = x.astype(np.int64), y.astype(np.int64)
        num = n * int((xs * ys).sum()) - int(xs.sum()) * int(ys.sum())
        va = n * int((xs * xs).sum()) - int(xs.sum()) ** 2
        vb = n * int((ys * ys).sum()) - int(ys.sum()) ** 2
        if va <= 0 or vb <= 0:
            return None
        return math.floor(1_000_000.0 * (float(num) / math.sqrt(float(va) * float(vb))))

    cols = {"a": a, "b": b, "c": c, "d": d, "e": e}
    for (x, y), (_, corr) in got.items():
        assert corr == ref(cols[x], cols[y]), (x, y)
    assert got[("a", "d")][1] is None and got[("d", "e")][1] is None
    assert got[("a", "e")][1] == -1_000_000
    assert got[("a", "b")][1] > 900_000
    assert abs(got[("a", "c")][1]) < 150_000


def test_benford_audit_exact_shares(spark):
    """benford_audit: digit counts from decimal strings, exact milli
    shares, zeros excluded and counted, absent digits emit n=0."""
    import math

    from xesmf_spark.quality import benford_audit

    vals = [1, 19, 123, 2, 25, 0, -34, 911, 0, 100]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = {r["digit"]: r for r in benford_audit(df, "x").collect()}
    assert set(rows) == set(range(1, 10))
    nonzero = [v for v in vals if v != 0]
    from collections import Counter

    c = Counter(int(str(abs(v))[0]) for v in nonzero)
    for d in range(1, 10):
        r = rows[d]
        assert r["n"] == c.get(d, 0)
        assert r["observed_milli"] == (1000 * c.get(d, 0)) // len(nonzero)
        assert r["expected_milli"] == math.floor(1000 * math.log10(1 + 1 / d))
        assert r["dev_milli"] == r["observed_milli"] - r["expected_milli"]
        assert r["n_zero"] == 2
    assert rows[5]["n"] == 0  # absent digit still present with n=0


def test_robust_stats_trimmed_and_winsorized(spark):
    """robust_stats: matches the exact local replay; the trimmed and
    winsorized means shrug off a spike the raw mean cannot; ties
    straddling the cut are multiset-invariant."""
    from xesmf_spark.quality import robust_stats

    vals = [10, 10, 10, 11, 12, 13, 14, 15, 16, 1000]  # n=10, k=1 at 10%
    df = spark.createDataFrame([("a", v) for v in vals], "k string, x long")
    row = robust_stats(df, ["k"], "x", trim_milli=100).collect()[0]
    s = sorted(vals)
    n, k = 10, 1
    lo, hi = s[k], s[n - k - 1]
    tsum = sum(s[k : n - k])
    wsum = sum(min(max(v, lo), hi) for v in vals)
    assert (row["n"], row["k_trim"], row["lo"], row["hi"]) == (n, k, lo, hi)
    assert row["trimmed_mean_micro"] == (1_000_000 * tsum) // (n - 2 * k)
    assert row["winsor_mean_micro"] == (1_000_000 * wsum) // n
    # robustness: both far below the raw mean (~111) times 1e6
    assert row["trimmed_mean_micro"] < 20_000_000
    import pytest

    with pytest.raises(ValueError, match="trim_milli"):
        robust_stats(df, ["k"], "x", trim_milli=500)


def test_benford_all_zero_group_dropped_not_null(spark):
    """r13 ADVICE: a group whose values are all zero has N = 0 digits;
    the group must be DROPPED (one semantic both engines state), never
    emitted with NULL observed/dev shares."""
    from xesmf_spark.quality import benford_audit

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 123), ("b", 0), ("b", 987)],
        "g string, v long",
    )
    rows = benford_audit(df, "v", group_cols=["g"]).collect()
    assert {r.g for r in rows} == {"b"}
    assert all(r.observed_milli is not None and r.dev_milli is not None for r in rows)
    brow = [r for r in rows if r.digit == 1][0]
    assert brow.n == 1 and brow.n_zero == 1  # 123 leads with 1; one zero
