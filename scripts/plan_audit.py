#!/usr/bin/env python
"""Physical-plan audit over every registered query — the scale contract
as an artifact.

For each ``__spark_entry__.queries()`` entry (streaming queries excluded
— building them RUNS the stream), plan the DataFrame at sf0.001 and
summarize the shapes that matter at 100 TB: shuffle (Exchange) count,
broadcast joins, scan pushdown, and the red-flag patterns that become
cluster-killers (CartesianProduct, BroadcastNestedLoopJoin over big
sides, SortAggregate on wide relations).

Writes PLANS.md. Exits 1 if any red flag appears outside the allowlist.

Allowlisted SortAggregate sites: Spark plans set-op EXCEPT/INTERSECT and
a few tiny-axis-table aggregations sort-based; those inputs are bounded
(axis tables / user-id sets), not data-volume relations.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: queries whose construction executes a streaming job
SKIP = {"stream_hourly", "stream_sliding", "stream_sessionize", "stream_dedup", "stream_regrid",
        "stream_interval_join", "stream_rollup"}

#: red flags that are deliberate & bounded where they appear.
#: BroadcastNestedLoopJoin is allowlisted ONLY where its broadcast side
#: is a bounded relation by construction — never a data-volume table:
#:   - regrid_* weight builds: the non-equi interval/bracket joins run
#:     on AXIS tables (<= 10^3 rows; SURVEY.md §4 — at scale the
#:     builders bucketize these into equi-joins, which is exactly what
#:     the bucketed nearest/clip/curvilinear paths do)
#:   - events_user_setops: a 1-row min(ts) scalar broadcast
#:   - knn_top3: the 1-row exactness-bound scalar in the rescue path
_REGRID_AXIS_BNLJ = {
    "regrid_conservative", "regrid_conservative_clip",
    "regrid_bilinear_periodic", "regrid_bilinear_noperiodic",
    "regrid_unmapped", "regrid_patch", "regrid_nearest_s2d",
    "regrid_nearest_d2s", "regrid_bilinear_locstream",
    "regrid_dataset_multivar", "regrid_conservative_4d",
}
ALLOW = {
    # set ops plan as sort-based aggs over user-id sets (bounded by key
    # cardinality, not event volume); the t0 scalar broadcast is 1 row
    "events_user_setops": {"SortAggregate", "BroadcastNestedLoopJoin"},
    # percentile is an ordered-statistics agg; group count is bounded
    # (event types), the sort is per-group in the agg buffer
    "events_percentiles": {"SortAggregate"},
    "knn_top3": {"BroadcastNestedLoopJoin"},
    # NB classifier: the class-total/vocab-size and unseen/prior
    # constants are 1-row scalar crosses (the model TABLE itself joins
    # keyed on the token — never broadcast)
    "pipeline_nb_quality": {"BroadcastNestedLoopJoin"},
    # Dirichlet QL: the |q|-row (3 terms) cf/T table crossed onto the
    # doc-length projection — query size is a tiny caller constant
    "documents_query_likelihood": {"BroadcastNestedLoopJoin"},
    # CCF: the two 1-row series means and the 1-row variance are
    # scalar broadcasts crossed onto state-shaped frames (the acf
    # join-back shape; the lag join itself is bucket-keyed equi)
    "events_ccf": {"BroadcastNestedLoopJoin"},
    # the quartile-cutoff sketch result is ONE broadcast row crossed
    # onto the corpus scan — replacing the global-sort window is the
    # whole point of this query's plan
    "documents_quality_tiers_approx": {"BroadcastNestedLoopJoin"},
    # the recall ratio crosses two 1-row count aggregates (1x1 join)
    "ann_ivf_recall": {"BroadcastNestedLoopJoin"},
    # the (n_nodes, n_edges, n_triangles) output row crosses three
    # 1-row count aggregates (1x1x1 join) — the wedge join itself is
    # keyed equi throughout
    "parts_copurchase_triangles": {"BroadcastNestedLoopJoin"},
    # same 1x1 recall-ratio cross, plus euclid_topk's broadcast cross
    # join — the documented exact AUDIT reference, not a scale path
    "ann_pq_recall": {"BroadcastNestedLoopJoin"},
    # sq8_encode crosses the ONE-ROW quantizer stats frame (per-dim
    # mins/spans arrays) onto the pool scan — a scalar broadcast, the
    # same class as events_user_setops' t0 row
    "ann_sq8_top3": {"BroadcastNestedLoopJoin"},
    # recall audit: the same 1-row stats cross (twice — both searches)
    # plus the 1x1 recall-ratio cross and euclid's audit cross join
    "ann_sq8_recall": {"BroadcastNestedLoopJoin"},
    # identical audit shape for the refined-IVFPQ recall number
    "ann_ivfpq_refine_recall": {"BroadcastNestedLoopJoin"},
    # the sketch's 1-row delta_total scalar broadcast crossed onto the
    # 8-row exact top-k (the contract-boolean audit join)
    "documents_heavy_hitters": {"BroadcastNestedLoopJoin"},
    "stream_heavy_hitters": {"BroadcastNestedLoopJoin"},
    # the funnel's ONE-ROW global step-count frame crossed onto the
    # 3-row step-label axis (scalar broadcast, not a data join)
    "events_funnel": {"BroadcastNestedLoopJoin"},
    # the global-average threshold is a 1-row scalar broadcast crossed
    # into customer (the q22 correlated-scalar decorrelation)
    "tpch_q22_inactive_customers": {"BroadcastNestedLoopJoin"},
    # the global-total threshold is a 1-row scalar broadcast crossed
    # into the per-part aggregate (the q11 HAVING-vs-total decorrelation)
    "tpch_q11_important_parts": {"BroadcastNestedLoopJoin"},
    # the corpus token total is a 1-row scalar broadcast crossed into
    # the token-frequency join (the LM normalization constant)
    "pipeline_unigram_quality": {"BroadcastNestedLoopJoin"},
    # same 1-row token-total scalar cross, bigram order (the unigram
    # mixture term's normalization constant)
    "pipeline_bigram_lm": {"BroadcastNestedLoopJoin"},
    # same 1-row token-total scalar cross, trigram order
    "pipeline_trigram_lm": {"BroadcastNestedLoopJoin"},
    # the 1-row bigram-TYPE total (KN's continuation normalizer T)
    # crossed onto the scoring rows
    "pipeline_kneser_ney_lm": {"BroadcastNestedLoopJoin"},
    # the 1-row (target_total, raw_total) scalar crossed onto the
    # n_buckets-row side table — DSIR's two normalization constants
    "pipeline_dsir": {"BroadcastNestedLoopJoin"},
    # the two 1-row corpus totals (N1 tokens, N2 bigrams) crossed onto
    # the bigram-type table — the PMI normalization constants
    "documents_pmi_collocations": {"BroadcastNestedLoopJoin"},
    # the two 1-row sample totals crossed onto the nbins-row bin frame
    # (PSI normalization constants)
    "orders_psi_drift": {"BroadcastNestedLoopJoin"},
    # the streaming twin audits the POST-STREAM PSI frame — the same
    # two 1-row totals crossed onto the nbins-row bin frame
    "stream_psi_drift": {"BroadcastNestedLoopJoin"},
    # the dense grid is generated-axis x distinct-types — both bounded
    # by construction (span hours / type cardinality), never fact-volume
    "events_hourly_gapfill": {"BroadcastNestedLoopJoin"},
    # the delta-split midpoint is a 1-row (min+max)/2 scalar broadcast
    # crossed onto the events scan; in production the split is a
    # partition boundary, not a computed scalar — the cross exists only
    # so the test derives the split from the data itself
    "events_continuous_rollup": {"BroadcastNestedLoopJoin"},
    # global (no grouping key) string MIN/MAX plans sort-based in Spark
    # (no mutable hash buffer for strings); with no keys the partial
    # agg reduces every partition to ONE row before the exchange, so
    # this is never a wide-relation sort
    "orders_profile": {"SortAggregate"},
    # the k rule-violation counts are ONE aggregated row crossed onto
    # the k-row rule-name axis (scalar broadcast, the funnel shape)
    "lineitem_constraints": {"BroadcastNestedLoopJoin"},
    # the same 1x1 recall-ratio cross as ann_sq8_recall, plus
    # euclid_topk's documented exact-audit broadcast cross join
    "ann_rp_recall": {"BroadcastNestedLoopJoin"},
    # the 1-row (N, n_zero) totals crossed onto the 9-row digit axis
    # (scalar-x-axis broadcast, the funnel/constraints shape)
    "orders_benford": {"BroadcastNestedLoopJoin"},
    # two 1-row scalar crosses (n_pairs onto the ranked frame, n_zero
    # onto the 1-row quantile result)
    "ann_rp_distortion": {"BroadcastNestedLoopJoin"},
    # the skyline's global verify is a LEFT ANTI theta-join whose
    # broadcast side is the FRONTIER-SIZED candidate set (phase-1 prune
    # output, not a data-volume relation) — the quadratic is bounded by
    # frontier^2 by construction
    "parts_skyline": {"BroadcastNestedLoopJoin"},
    # the 1-row distinct-basket total N crossed onto the pair-count
    # aggregate (lift normalization constant — the PSI/PMI shape)
    "parts_basket_rules": {"BroadcastNestedLoopJoin"},
    # fold-path centroid assignment crosses vectors with the
    # n_centroids-row codebook (8 rows, bounded by construction — the
    # differential-reference path; the gemm path has no cross)
    "ann_filtered_top3": {"BroadcastNestedLoopJoin"},
    **{q: {"BroadcastNestedLoopJoin"} for q in _REGRID_AXIS_BNLJ},
}

RED = ("CartesianProduct", "BroadcastNestedLoopJoin", "SortAggregate")


def main():
    import __spark_entry__ as E
    from xesmf_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    rows, bad = [], []
    for name, fn in E.queries().items():
        if name in SKIP:
            rows.append((name, "—", "—", "—", "streaming (plan not statically auditable)"))
            continue
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows.append((name, "?", "?", "?", f"PLAN ERROR: {type(e).__name__}"))
            bad.append(name)
            continue
        n_ex = plan.count("Exchange")
        n_bc = plan.count("BroadcastHashJoin") + plan.count("BroadcastExchange")
        # report 'yes' only when some scan actually carries a non-empty
        # filter list (r5 ADVICE: the old prefix check was vacuously
        # true). No closing-] requirement: plan toString TRUNCATES long
        # filter lists ("PushedFilters: [IsNotNull(a), GreaterTh...")
        pushed_lists = re.findall(r"PushedFilters: \[([^\]\n]*)", plan)
        if "Scan parquet" not in plan:
            pushed = "n/a"
        elif any(g.strip() for g in pushed_lists):
            pushed = "yes"
        else:
            pushed = "none"
        flags = [r for r in RED if r in plan and r not in ALLOW.get(name, set())]
        note = ", ".join(flags) if flags else "clean"
        allowed = [r for r in RED if r in plan and r in ALLOW.get(name, set())]
        if allowed:
            note += f" (allowlisted: {', '.join(allowed)})"
        rows.append((name, str(n_ex), str(n_bc), pushed, note))
        if flags:
            bad.append(name)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("# Physical-plan audit (generated by scripts/plan_audit.py)\n\n")
        f.write("Shapes that decide 100-TB viability, per registered query.\n")
        f.write("`exchanges` counts shuffle boundaries (incl. broadcasts); `pushdown`\n")
        f.write("reports whether parquet scans carry PushedFilters.\n\n")
        f.write("| query | exchanges | broadcast nodes | scan pushdown | red flags |\n")
        f.write("|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
        f.write(f"\n{len(rows)} queries audited; {len(bad)} with unallowlisted red flags")
        f.write(f" ({', '.join(bad)})\n" if bad else ".\n")

    print(f"{len(rows)} audited, {len(bad)} flagged: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
