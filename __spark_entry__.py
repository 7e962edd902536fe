"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2) as
(spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query; the driver
hash-compares both sides at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xesmf_spark import queries as Q
from xesmf_spark import oracle as O
from xesmf_spark import pipeline_oracle as PO


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan sf0.001 lineitem → derive a field on the fixture
    source grid (deterministic hash-assignment of rows to cells) →
    conservative regrid onto the destination grid. Exercises parquet
    scan, hash agg, weight-generation joins, and the join-agg apply."""
    from xesmf_spark.apply import smm_apply
    from xesmf_spark.grids import grid_global
    from xesmf_spark.weights import conservative_weights

    g_in = grid_global(spark, 20, 12)
    g_out = grid_global(spark, 15, 9)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    field = (
        li.select((F.col("l_orderkey") % F.lit(g_in.n_cells)).alias("cell_id"), "l_quantity")
        .groupBy("cell_id")
        .agg(F.sum("l_quantity").alias("value"))
    )
    w = conservative_weights(g_in, g_out)
    out = smm_apply(field, w, g_out)
    return out.select("cell_id", "lon", "lat", F.round("value", 6).alias("value"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries only.  Round-15 rotation (policy + log in SURVEY.md 2E)
    # is applied by the _R15_WINDOW reorder at the end of this
    # function: (a) 9 r15 NEW queries (progressive-JPEG resize carrier,
    # trigram interpolated LM, URL-domain caps + stratified sampling,
    # Kneser-Ney bigram LM, recency-weighted age sampling, Gopher
    # duplicate-line repetition stats, prefix-doubling suffix ranks,
    # suffix-order longest repeated substrings, DSIR importance
    # resampling weights);
    # (b) 2 r15 CHANGED — multimodal_image_resize_jpeg (decode_jpeg
    # restructure: SOF1/SOF2 acceptance, bounded LUT cache, fill-byte
    # destuffing) and documents_query_likelihood (T·(max_dl+mu) wrap
    # gate); (c) the 8 remaining r14-new single-greens (second green:
    # nb_quality, exactsubstr, winnowing, holt, attribution,
    # stream_sliding, rake, ccf); (d) the 17-query r13-new single-green
    # block that headed the tail line (rp family, record_linkage,
    # seasonal decompose/anomalies, cusum batch+stream, proximity,
    # gapfill, feature_hash, sequential, theilsen, ppr, robust_stats,
    # video_avi); (e) the 7 stale cyclers the r14 log promised slots
    # (conservative_clip/_4d, dataset_multivar, stream_regrid,
    # sketch_accuracy, q8, q9); (f) 7 from the next tail stratum (the
    # r12 singles: unigram_tok, audio_wav, shortest_paths, mixture,
    # hybrid_rrf, ks/w1 drift — pipeline_containment, ann_sq8_recall,
    # ann_sq8_top3, documents_textrank, documents_char_entropy and
    # nations_trade_hits yielded their slots to the late-r15 new
    # queries and head the line for r16 with same-round full-surface
    # evidence).  The dict literal below keeps its
    # historical grouping; the reorder — not the literal — is the
    # window of record.
    # Prior-round rationale (r12):
    # IN-WINDOW = (a) 23 r12 NEW queries (unigram tok/encode, WAV
    # stats + resample, bilinear image resize, streaming PSI,
    # snapshot version diff, correlation profile, weighted PageRank,
    # shortest-paths, mixture, RRF, KS + W1 drift, HITS, SQ8 top3 +
    # recall, MMR rerank, grouped split, char entropy, TextRank,
    # containment, multi-level span dedup) + 8 r12 engine-changed (decode-gate fix touches every
    # resize/ahash query; jpeg.py marker loop; BPE batched merges;
    # span-dedup multi-level), (b) the 3 reachable singles the r11
    # verdict names (orders_burst_components — zero lifetime driver
    # greens; customers_upsert_delete + stream_cdc_apply — one each)
    # plus trade_graph_components (r11 first-green), then (c) 15
    # cyclers from the STALEST tail stratum (last driver-checked
    # r6/r7).
    # Tail is ordered freshest-evidence-first so each round's cyclers
    # come off the DEEP end; same-round evidence for every tail entry
    # comes from the committed full-surface record + tri-scale runs.
    base = {
        # (a00) r14 NEW queries lead the window
        "pipeline_nb_quality": Q.pipeline_nb_quality,
        "pipeline_exactsubstr": Q.pipeline_exactsubstr,
        "documents_winnowing": Q.documents_winnowing,
        "documents_query_likelihood": Q.documents_query_likelihood,
        "orders_holt_forecast": Q.orders_holt_forecast,
        "events_attribution": Q.events_attribution,
        "stream_sliding": Q.stream_sliding,
        "documents_rake": Q.documents_rake,
        "events_ccf": Q.events_ccf,
        # (a0) r13 NEW queries (skyline, basket rules, record linkage,
        # seasonal decomposition, CUSUM changepoint)
        "parts_skyline": Q.parts_skyline,
        "ann_rp_project": Q.ann_rp_project,
        "ann_rp_top3": Q.ann_rp_top3,
        "ann_rp_recall": Q.ann_rp_recall,
        "ann_rp_distortion": Q.ann_rp_distortion,
        "parts_basket_rules": Q.parts_basket_rules,
        "customers_record_linkage": Q.customers_record_linkage,
        "orders_seasonal_decompose": Q.orders_seasonal_decompose,
        "events_cusum_changepoint": Q.events_cusum_changepoint,
        "stream_cusum": Q.stream_cusum,
        "documents_proximity": Q.documents_proximity,
        "events_acf": Q.events_acf,
        "orders_seasonal_anomalies": Q.orders_seasonal_anomalies,
        "orders_gapfill_interpolate": Q.orders_gapfill_interpolate,
        "documents_feature_hash": Q.documents_feature_hash,
        "events_sequential_patterns": Q.events_sequential_patterns,
        "events_theilsen": Q.events_theilsen,
        "orders_benford": Q.orders_benford,
        "nations_trade_ppr": Q.nations_trade_ppr,
        "events_robust_stats": Q.events_robust_stats,
        "multimodal_video_avi": Q.multimodal_video_avi,
        # (a) r12 NEW queries
        "pipeline_unigram_tok": Q.pipeline_unigram_tok,
        "multimodal_audio_wav": Q.multimodal_audio_wav,
        "trade_graph_shortest_paths": Q.trade_graph_shortest_paths,
        "pipeline_mixture_sample": Q.pipeline_mixture_sample,
        "documents_hybrid_rrf": Q.documents_hybrid_rrf,
        "orders_ks_drift": Q.orders_ks_drift,
        "orders_w1_drift": Q.orders_w1_drift,
        "nations_trade_hits": Q.nations_trade_hits,
        "ann_sq8_top3": Q.ann_sq8_top3,
        "documents_char_entropy": Q.documents_char_entropy,
        "documents_textrank": Q.documents_textrank,
        "pipeline_containment": Q.pipeline_containment,
        "ann_sq8_recall": Q.ann_sq8_recall,
        "ann_mmr_top3": Q.ann_mmr_top3,
        "pipeline_split_grouped": Q.pipeline_split_grouped,
        "multimodal_audio_resample": Q.multimodal_audio_resample,
        "multimodal_image_resize_bilinear": Q.multimodal_image_resize_bilinear,
        "stream_psi_drift": Q.stream_psi_drift,
        "orders_snapshot_diff": Q.orders_snapshot_diff,
        "lineitem_correlations": Q.lineitem_correlations,
        "nations_trade_pagerank_weighted": Q.nations_trade_pagerank_weighted,
        "pipeline_unigram_encode": Q.pipeline_unigram_encode,
        "pipeline_span_dedup_multilevel": Q.pipeline_span_dedup_multilevel,
        # r12 engine-changed: loud decode gates for recognized image
        # signatures (multimodal.py kernel -> all resize/ahash queries) +
        # JPEG fill-byte/standalone-marker parsing (jpeg.py); BPE and
        # span-dedup queries sit here ahead of this round's planned
        # batched-merge / multi-level changes
        "pipeline_bpe_train": Q.pipeline_bpe_train,
        "pipeline_bpe_encode": Q.pipeline_bpe_encode,
        "pipeline_span_dedup": Q.pipeline_span_dedup,
        "multimodal_image_resize": Q.multimodal_image_resize,
        "multimodal_image_resize_png": Q.multimodal_image_resize_png,
        "multimodal_image_resize_jpeg": Q.multimodal_image_resize_jpeg,
        "multimodal_image_resize_jpeg_progressive": (
            Q.multimodal_image_resize_jpeg_progressive
        ),
        "multimodal_ahash_pairs": Q.multimodal_ahash_pairs,
        "multimodal_ahash_dedup": Q.multimodal_ahash_dedup,
        # (b) the 3 reachable singles (r11 verdict ask #1):
        # orders_burst_components has ZERO lifetime driver greens,
        # customers_upsert_delete + stream_cdc_apply one each, plus
        # trade_graph_components (r11 first-green, second green here)
        "orders_burst_components": Q.orders_burst_components,
        "customers_upsert_delete": Q.customers_upsert_delete,
        "stream_cdc_apply": Q.stream_cdc_apply,
        "trade_graph_components": Q.trade_graph_components,
        # (c) cyclers: the STALEST tail stratum (last driver-checked
        # r6/r7 windows; same-round evidence since then = committed
        # full-surface records + tri-scale runs), in tail order —
        # entries past position 50 spill out of the window as (a) grew
        # this session and cycle back next round
        "tpch_q19_disjunctive": Q.tpch_q19_disjunctive,
        "pipeline_editdist_dedup": Q.pipeline_editdist_dedup,
        "documents_quality_tiers": Q.documents_quality_tiers,
        "events_props_stats": Q.events_props_stats,
        "pipeline_curate": Q.pipeline_curate,
        "stream_hourly": Q.stream_hourly,
        "stream_sessionize": Q.stream_sessionize,
        "stream_dedup": Q.stream_dedup,
        "regrid_bilinear_periodic": Q.regrid_bilinear_periodic,
        "regrid_bilinear_noperiodic": Q.regrid_bilinear_noperiodic,
        "regrid_patch": Q.regrid_patch,
        "regrid_nearest_s2d": Q.regrid_nearest_s2d,
        "regrid_nearest_d2s": Q.regrid_nearest_d2s,
        "regrid_bilinear_locstream": Q.regrid_bilinear_locstream,
        "regrid_bilinear_curvilinear": Q.regrid_bilinear_curvilinear,
        "regrid_patch_curvilinear": Q.regrid_patch_curvilinear,
        "tpch_q1": Q.tpch_q1,
        "tpch_q3_top10": Q.tpch_q3_top10,
        "tpch_q5_local_supplier": Q.tpch_q5_local_supplier,
        "events_hourly": Q.events_hourly,
        "events_sessionize": Q.events_sessionize,
        "events_asof_join": Q.events_asof_join,
        "events_interval_join": Q.events_interval_join,
        "stream_interval_join": Q.stream_interval_join,
        "pipeline_exact_dedup": Q.pipeline_exact_dedup,
        "pipeline_clean_corpus": Q.pipeline_clean_corpus,
        "pipeline_simhash": Q.pipeline_simhash,
        "pipeline_ngram_jaccard": Q.pipeline_ngram_jaccard,
        "pipeline_text_stats": Q.pipeline_text_stats,
        "pipeline_langid": Q.pipeline_langid,
        "pipeline_fingerprint": Q.pipeline_fingerprint,
        "pipeline_token_freq": Q.pipeline_token_freq,
        "pipeline_chunks": Q.pipeline_chunks,
        "ann_cosine_top3": Q.ann_cosine_top3,
        "ann_ivf_top3": Q.ann_ivf_top3,
        "ann_embedding_dedup": Q.ann_embedding_dedup,
        "knn_top3": Q.knn_top3,
        "multimodal_features": Q.multimodal_features,
        # ---- tail: freshest evidence first (r11-window double-greens),
        # then the r8-r10 strata; the window pulls cyclers from the DEEP
        # end (stalest) each round ----
        "pipeline_cdc_chunks": Q.pipeline_cdc_chunks,
        "customers_shared_supplier_jaccard": Q.customers_shared_supplier_jaccard,
        "trade_graph_communities": Q.trade_graph_communities,
        "orders_snapshot_vacuum": Q.orders_snapshot_vacuum,
        "pipeline_manifest_sink_roundtrip": Q.pipeline_manifest_sink_roundtrip,
        "ann_ivfpq_refine_recall": Q.ann_ivfpq_refine_recall,
        "pipeline_weighted_sample": Q.pipeline_weighted_sample,
        "events_retention_cohorts": Q.events_retention_cohorts,
        "events_session_paths": Q.events_session_paths,
        "orders_topk_per_group": Q.orders_topk_per_group,
        "customers_scd2": Q.customers_scd2,
        "documents_tfidf_terms": Q.documents_tfidf_terms,
        "documents_bm25": Q.documents_bm25,
        "documents_cms_frequency": Q.documents_cms_frequency,
        "events_ewma_daily": Q.events_ewma_daily,
        "events_anomaly_mad": Q.events_anomaly_mad,
        "orders_time_travel": Q.orders_time_travel,
        "orders_profile": Q.orders_profile,
        "lineitem_quantity_histogram": Q.lineitem_quantity_histogram,
        "pipeline_prefix_filter_pairs": Q.pipeline_prefix_filter_pairs,
        "events_session_window": Q.events_session_window,
        "events_unpivot": Q.events_unpivot,
        "pipeline_dedup_keep_best": Q.pipeline_dedup_keep_best,
        "ann_filtered_top3": Q.ann_filtered_top3,
        "stream_snapshot_ingest": Q.stream_snapshot_ingest,
        "orders_schema_evolution": Q.orders_schema_evolution,
        "stream_anomaly_mad": Q.stream_anomaly_mad,
        "documents_inverted_index": Q.documents_inverted_index,
        "events_trend_slope": Q.events_trend_slope,
        "orders_bucketed_join": Q.orders_bucketed_join,
        "events_concurrent_sessions": Q.events_concurrent_sessions,
        "orders_table_diff": Q.orders_table_diff,
        "orders_priority_pit": Q.orders_priority_pit,
        "nations_trade_pagerank": Q.nations_trade_pagerank,
        "stream_synthetic_source": Q.stream_synthetic_source,
        "lineitem_constraints": Q.lineitem_constraints,
        "pipeline_bigram_lm": Q.pipeline_bigram_lm,
        "pipeline_trigram_lm": Q.pipeline_trigram_lm,
        "pipeline_domain_caps": Q.pipeline_domain_caps,
        "pipeline_kneser_ney_lm": Q.pipeline_kneser_ney_lm,
        "pipeline_dsir": Q.pipeline_dsir,
        "pipeline_recency_sample": Q.pipeline_recency_sample,
        "documents_dup_lines": Q.documents_dup_lines,
        "documents_suffix_ranks": Q.documents_suffix_ranks,
        "documents_longest_repeats": Q.documents_longest_repeats,
        "parts_copurchase_triangles": Q.parts_copurchase_triangles,
        "documents_pmi_collocations": Q.documents_pmi_collocations,
        "parts_copurchase_clustering": Q.parts_copurchase_clustering,
        "orders_psi_drift": Q.orders_psi_drift,
        "trade_graph_kcore": Q.trade_graph_kcore,
        "ann_pq_top3_sharded": Q.ann_pq_top3_sharded,
        "pipeline_csv_roundtrip": Q.pipeline_csv_roundtrip,
        "multimodal_frame_sample": Q.multimodal_frame_sample,
        "pipeline_unigram_quality": Q.pipeline_unigram_quality,
        "pipeline_decontaminate": Q.pipeline_decontaminate,
        "orders_rollup": Q.orders_rollup,
        "events_pivot": Q.events_pivot,
        "events_clicks_errors_full_outer": Q.events_clicks_errors_full_outer,
        "events_hourly_gapfill": Q.events_hourly_gapfill,
        "ann_pq_top3": Q.ann_pq_top3,
        "ann_pq_recall": Q.ann_pq_recall,
        "customers_upsert": Q.customers_upsert,
        "pipeline_pack_contexts": Q.pipeline_pack_contexts,
        "documents_segments_udtf": Q.documents_segments_udtf,
        "pipeline_orc_roundtrip": Q.pipeline_orc_roundtrip,
        "events_partitioned_scan": Q.events_partitioned_scan,
        "events_hll_merge": Q.events_hll_merge,
        "events_trailing_window": Q.events_trailing_window,
        "pipeline_token_budget": Q.pipeline_token_budget,
        "stream_interval_join_outer": Q.stream_interval_join_outer,
        "events_props_flatten_udtf": Q.events_props_flatten_udtf,
        "documents_heavy_hitters": Q.documents_heavy_hitters,
        "stream_heavy_hitters": Q.stream_heavy_hitters,
        "lineitem_bloom_prune_join": Q.lineitem_bloom_prune_join,
        "pipeline_decontaminate_fuzzy": Q.pipeline_decontaminate_fuzzy,
        "pipeline_compact_small_files": Q.pipeline_compact_small_files,
        "events_zorder_scan": Q.events_zorder_scan,
        "orders_incr_join_view": Q.orders_incr_join_view,
        "events_funnel": Q.events_funnel,
        "events_rollup_hll_distinct": Q.events_rollup_hll_distinct,
        "events_props_variant": Q.events_props_variant,
        "synthetic_source_scan": Q.synthetic_source_scan,
        "ann_ivfpq_refine_top3": Q.ann_ivfpq_refine_top3,
        "tpch_q6_forecast": Q.tpch_q6_forecast,
        "tpch_q7_volume_shipping": Q.tpch_q7_volume_shipping,
        "tpch_q10_returned": Q.tpch_q10_returned,
        "tpch_q14_promo": Q.tpch_q14_promo,
        "tpch_q15_top_supplier": Q.tpch_q15_top_supplier,
        "tpch_q18_large_orders": Q.tpch_q18_large_orders,
        "orders_rank_in_customer": Q.orders_rank_in_customer,
        "regrid_unmapped": Q.regrid_unmapped,
        "events_cube": Q.events_cube,
        "events_percentiles": Q.events_percentiles,
        "customers_semi_open_orders": Q.customers_semi_open_orders,
        "events_user_setops": Q.events_user_setops,
        "events_geomean_udaf": Q.events_geomean_udaf,
        "tpch_q4_priority": Q.tpch_q4_priority,
        "tpch_q12_priority_class": Q.tpch_q12_priority_class,
        "tpch_q13_order_distribution": Q.tpch_q13_order_distribution,
        "tpch_q17_small_qty": Q.tpch_q17_small_qty,
        "tpch_q22_inactive_customers": Q.tpch_q22_inactive_customers,
        "orders_above_customer_avg": Q.orders_above_customer_avg,
        "pipeline_split": Q.pipeline_split,
        "pipeline_scrub_pii": Q.pipeline_scrub_pii,
        "pipeline_repetition": Q.pipeline_repetition,
        "pipeline_stratified_sample": Q.pipeline_stratified_sample,
        "multimodal_audio_windows": Q.multimodal_audio_windows,
        "ann_lsh_dedup": Q.ann_lsh_dedup,
        "ann_ivf_recall": Q.ann_ivf_recall,
        "documents_quality_tiers_approx": Q.documents_quality_tiers_approx,
        "pipeline_jsonl_roundtrip": Q.pipeline_jsonl_roundtrip,
        "salted_join_skew": Q.salted_join_skew,
        "ann_ivf_multiprobe": Q.ann_ivf_multiprobe,
        "tpch_q2_min_cost_supplier": Q.tpch_q2_min_cost_supplier,
        "tpch_q11_important_parts": Q.tpch_q11_important_parts,
        "tpch_q16_supplier_count": Q.tpch_q16_supplier_count,
        "tpch_q20_excess_shippers": Q.tpch_q20_excess_shippers,
        "tpch_q21_waiting_suppliers": Q.tpch_q21_waiting_suppliers,
        "ann_ivfpq_top3": Q.ann_ivfpq_top3,
        "stream_rollup": Q.stream_rollup,
        "events_continuous_rollup": Q.events_continuous_rollup,
        "pipeline_minhash_dedup": Q.pipeline_minhash_dedup,
        "pipeline_dedup_groups": Q.pipeline_dedup_groups,
        "pipeline_simhash_pairs": Q.pipeline_simhash_pairs,
        "regrid_conservative": Q.regrid_conservative,
        "regrid_conservative_clip": Q.regrid_conservative_clip,
        "regrid_conservative_4d": Q.regrid_conservative_4d,
        "regrid_dataset_multivar": Q.regrid_dataset_multivar,
        "stream_regrid": Q.stream_regrid,
        "events_sketch_accuracy": Q.events_sketch_accuracy,
        "tpch_q8_market_share": Q.tpch_q8_market_share,
        "tpch_q9_product_type": Q.tpch_q9_product_type,
    }
    out = {k: base[k] for k in _R15_WINDOW}
    out.update({k: v for k, v in base.items() if k not in out})
    return out


#: the 50 driver-checked entries for round 15 — see the rotation
#: rationale at the top of queries().  Everything not listed keeps its
#: dict-literal order behind these (freshest evidence first, so the
#: r14/r13 blocks that just rotated out sit at the tail head).
_R15_WINDOW = [
    # (a) r15 new
    "multimodal_image_resize_jpeg_progressive",
    "pipeline_trigram_lm",
    "pipeline_domain_caps",
    "pipeline_kneser_ney_lm",
    "pipeline_dsir",
    "pipeline_recency_sample",
    "documents_dup_lines",
    "documents_suffix_ranks",
    "documents_longest_repeats",
    # (b) r15 changed — engine or oracle
    "multimodal_image_resize_jpeg",
    "documents_query_likelihood",
    # (c) the 8 remaining r14-new single-greens (second green)
    "pipeline_nb_quality",
    "pipeline_exactsubstr",
    "documents_winnowing",
    "orders_holt_forecast",
    "events_attribution",
    "stream_sliding",
    "documents_rake",
    "events_ccf",
    # (d) the r13-new single-green block that headed the tail line
    "ann_rp_project",
    "ann_rp_top3",
    "ann_rp_recall",
    "ann_rp_distortion",
    "customers_record_linkage",
    "orders_seasonal_decompose",
    "events_cusum_changepoint",
    "stream_cusum",
    "documents_proximity",
    "orders_seasonal_anomalies",
    "orders_gapfill_interpolate",
    "documents_feature_hash",
    "events_sequential_patterns",
    "events_theilsen",
    "nations_trade_ppr",
    "events_robust_stats",
    "multimodal_video_avi",
    # (e) the stale cyclers the r14 rotation promised slots
    "regrid_conservative_clip",
    "regrid_conservative_4d",
    "regrid_dataset_multivar",
    "stream_regrid",
    "events_sketch_accuracy",
    "tpch_q8_market_share",
    "tpch_q9_product_type",
    # (f) the next tail stratum (r12 singles) fills the window
    "pipeline_unigram_tok",
    "multimodal_audio_wav",
    "trade_graph_shortest_paths",
    "pipeline_mixture_sample",
    "documents_hybrid_rrf",
    "orders_ks_drift",
    "orders_w1_drift",
]


#: recompute every output byte of the decode->grayscale->resample
#: chain arithmetically: source pixel (r,c,ch) of image d is
#: (d + 7r + 13c + 29ch) mod 256; nearest-neighbor 16->8 picks
#: (2i, 2j); grayscale is the truncated channel mean
def _img_resize_bilinear_oracle(h=16, w=16, oh=6, ow=6) -> str:
    """Closed-form replay of multimodal_image_resize_bilinear: the
    full-res gray value is a pure doc_id/row/col formula (same fixture
    as _IMG_RESIZE_ORACLE), so the 4-tap fixed-point blend inlines the
    formula four times — no joins, no floats, rounded integer division
    identical to the kernel."""
    dy, dx = 2 * oh, 2 * ow
    den = dx * dy

    def gray(i, j):
        e = f"(doc_id + 7 * ({i}) + 13 * ({j}))"
        return f"(({e}) % 256 + ({e} + 29) % 256 + ({e} + 58) % 256) // 3"

    return f"""
WITH g AS (SELECT CAST(t.d AS BIGINT) AS doc_id FROM range(0, 48) t(d)),
grid AS (
  SELECT doc_id, CAST(a.r AS BIGINT) AS r, CAST(b.c AS BIGINT) AS c
  FROM g, range(0, {oh}) a(r), range(0, {ow}) b(c)
),
pos AS (
  SELECT doc_id, r, c,
         GREATEST((2 * r + 1) * {h} - {oh}, 0) // {dy} AS y0,
         GREATEST((2 * r + 1) * {h} - {oh}, 0) % {dy} AS fy,
         GREATEST((2 * c + 1) * {w} - {ow}, 0) // {dx} AS x0,
         GREATEST((2 * c + 1) * {w} - {ow}, 0) % {dx} AS fx
  FROM grid
),
pos2 AS (
  SELECT doc_id, r, c, y0, fy, x0, fx,
         LEAST(y0 + 1, {h - 1}) AS y1,
         LEAST(x0 + 1, {w - 1}) AS x1
  FROM pos
),
px AS (
  SELECT doc_id,
         (({gray("y0", "x0")}) * ({dx} - fx) * ({dy} - fy)
          + ({gray("y0", "x1")}) * fx * ({dy} - fy)
          + ({gray("y1", "x0")}) * ({dx} - fx) * fy
          + ({gray("y1", "x1")}) * fx * fy
          + {den // 2}) // {den} AS v
  FROM pos2
)
SELECT doc_id,
       CAST({oh} AS BIGINT) AS height,
       CAST({ow} AS BIGINT) AS width,
       CAST(SUM(v) AS BIGINT) AS byte_sum,
       CAST(MIN(v) AS BIGINT) AS byte_min,
       CAST(MAX(v) AS BIGINT) AS byte_max
FROM px
GROUP BY doc_id
"""


_IMG_RESIZE_ORACLE = """
WITH g AS (SELECT CAST(t.d AS BIGINT) AS doc_id FROM range(0, 48) t(d)),
px AS (
  SELECT doc_id,
         ((doc_id + 14 * a.i + 26 * b.j) % 256
          + (doc_id + 14 * a.i + 26 * b.j + 29) % 256
          + (doc_id + 14 * a.i + 26 * b.j + 58) % 256) // 3 AS gray
  FROM g, range(0, 8) a(i), range(0, 8) b(j)
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS width,
       CAST(SUM(gray) AS BIGINT) AS byte_sum,
       CAST(MIN(gray) AS BIGINT) AS byte_min,
       CAST(MAX(gray) AS BIGINT) AS byte_max
FROM px
GROUP BY doc_id
"""


def _img_resize_jpeg_oracle() -> str:
    """Expected stats for multimodal_image_resize_jpeg, computed by the
    PURE-PYTHON reference reconstruction (jpeg.expected_reconstruction
    — no Spark, no bitstream) and embedded as a VALUES table.  JPEG is
    lossy, so a closed-form pixel-arithmetic oracle like
    _IMG_RESIZE_ORACLE is impossible; the check pinned here is that
    the executor-side path (encode -> Huffman decode -> dequant/IDCT ->
    upsample -> grayscale -> resample) lands bit-equal to the
    reference kernel for every image."""
    import numpy as np

    from xesmf_spark.jpeg import expected_reconstruction

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]
    idx = (np.arange(8) * 16) // 8
    rows = []
    for d in range(48):
        img = ((d + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
        exp = expected_reconstruction(
            img, quality=85, subsampling=("4:4:4", "4:2:0", "4:2:2")[d % 3]
        )
        gray = exp.mean(axis=2).astype(np.uint8)
        small = gray[np.ix_(idx, idx)].astype(np.int64)
        rows.append(f"({d}, {int(small.sum())}, {int(small.min())}, {int(small.max())})")
    values = ",\n       ".join(rows)
    return f"""
SELECT CAST(v.d AS BIGINT) AS doc_id,
       CAST(8 AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS width,
       CAST(v.s AS BIGINT) AS byte_sum,
       CAST(v.mn AS BIGINT) AS byte_min,
       CAST(v.mx AS BIGINT) AS byte_max
FROM (VALUES {values}) AS v(d, s, mn, mx)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "parts_skyline": PO.skyline_sql(),
        "ann_rp_project": PO.rp_project_sql(),
        "ann_rp_distortion": PO.rp_distortion_sql(),
        "ann_rp_top3": PO.rp_topk_sql(),
        "ann_rp_recall": f"""
WITH exact_q AS ({PO.ann_euclid_topk_sql()}),
approx_q AS ({PO.rp_topk_sql()}),
m AS (
  SELECT COUNT(*) AS n_matched
  FROM exact_q e JOIN approx_q a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
),
e AS (SELECT COUNT(*) AS n_exact FROM exact_q)
SELECT ROUND(CAST(n_matched AS DOUBLE) / n_exact, 6) AS recall_at_3,
       n_exact, n_matched
FROM e, m
""",
        "parts_basket_rules": PO.basket_rules_sql(),
        "customers_record_linkage": PO.record_linkage_sql(),
        "orders_seasonal_decompose": PO.seasonal_decompose_sql(),
        "events_cusum_changepoint": PO.cusum_changepoint_sql(),
        # the streaming twin: 4-batch sum-merged state == the batch
        # rollup exactly (mergeable integer partials), same replay
        "stream_cusum": PO.cusum_changepoint_sql(),
        "nations_trade_ppr": PO.ppr_sql(iters=3),
        "events_robust_stats": PO.robust_stats_sql(),
        "events_theilsen": """
-- Theil-Sen replay: daily cents rollup, all ordered pairs per type,
-- micro-lifted truncating slopes, med2-doubled median (ULP-safe)
WITH r AS MATERIALIZED (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         CAST((1000000 * (b.cents - a.cents)) // (b.day - a.day)
              AS BIGINT) AS s
  FROM r a JOIN r b ON a.event_type = b.event_type AND a.day < b.day
)
SELECT event_type,
       CAST(ROUND(2 * MEDIAN(s)) AS BIGINT) AS slope_med2_micro,
       COUNT(*) AS n_pairs
FROM p GROUP BY event_type
""",
        "orders_benford": """
-- Benford replay: first digit from the decimal string of |cents|,
-- exact milli shares, floored log10(1+1/d) expectation per digit
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
tot AS (
  SELECT COUNT(*) FILTER (cents != 0) AS N,
         COUNT(*) FILTER (cents = 0) AS n_zero
  FROM c
),
d AS (
  SELECT CAST(substr(CAST(ABS(cents) AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS cnt
  FROM c WHERE cents != 0 GROUP BY 1
),
ax AS (
  SELECT CAST(t.dd AS INT) AS digit,
         CAST(FLOOR(1000 * LOG10(1 + 1.0 / t.dd)) AS BIGINT)
           AS expected_milli
  FROM unnest(range(1, 10)) AS t(dd)
)
SELECT ax.digit, CAST(COALESCE(cnt, 0) AS BIGINT) AS n,
       CAST((1000 * COALESCE(cnt, 0)) // (SELECT N FROM tot) AS BIGINT)
         AS observed_milli,
       ax.expected_milli,
       CAST((1000 * COALESCE(cnt, 0)) // (SELECT N FROM tot)
            - ax.expected_milli AS BIGINT) AS dev_milli,
       CAST((SELECT n_zero FROM tot) AS BIGINT) AS n_zero
FROM ax LEFT JOIN d USING (digit)
WHERE (SELECT N FROM tot) > 0  -- all-zero input: no digits to audit
""",
        "events_sequential_patterns": """
-- replay: per-user event streams ordered by (epoch-ns ts, event_id),
-- adjacent 2-/3-runs via LEAD, support = distinct users, >= 15 kept
WITH base AS (
  SELECT user_id, EPOCH_NS(ts) AS tns, event_id, event_type FROM events
),
l AS (
  SELECT user_id, event_type AS i0,
         LEAD(event_type, 1) OVER w AS i1,
         LEAD(event_type, 2) OVER w AS i2
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
),
runs AS (
  SELECT user_id, i0 || '>' || i1 AS pattern, 2 AS length
  FROM l WHERE i1 IS NOT NULL
  UNION ALL
  SELECT user_id, i0 || '>' || i1 || '>' || i2 AS pattern, 3 AS length
  FROM l WHERE i2 IS NOT NULL
)
SELECT pattern, CAST(length AS BIGINT) AS length,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS support,
       COUNT(*) AS n_occurrences
FROM runs GROUP BY pattern, length
HAVING COUNT(DISTINCT user_id) >= 15
""",
        "orders_gapfill_interpolate": """
-- replay: weekly rollup, LEAD to the next present week, linear
-- integer interpolation for the in-between weeks (truncating //),
-- unioned with the originals
WITH r AS MATERIALIZED (
  SELECT o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
           AS wk,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
n AS (
  SELECT o_orderpriority, wk, cents,
         LEAD(wk) OVER w AS wk1, LEAD(cents) OVER w AS cents1
  FROM r WINDOW w AS (PARTITION BY o_orderpriority ORDER BY wk)
),
fill AS (
  SELECT o_orderpriority, t.tm AS wk,
         CAST(cents + ((cents1 - cents) * (t.tm - wk)) // (wk1 - wk)
              AS BIGINT) AS cents,
         TRUE AS is_interpolated
  FROM n, unnest(range(wk + 1, wk1)) AS t(tm)
  WHERE wk1 IS NOT NULL AND wk1 - wk > 1
)
SELECT o_orderpriority, wk, cents, FALSE AS is_interpolated FROM r
UNION ALL
SELECT * FROM fill
""",
        "documents_feature_hash": """
-- hashing-trick replay off the md5-portable hash pair: bucket =
-- ((first 15 md5 hex chars) % 1000000007) % 64 (base_hash then the
-- feature modulus), sign from the un-reduced hash's low bit;
-- zero-sum buckets dropped
WITH toks AS (
  SELECT doc_id, t.term
  FROM (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                        ' ') AS ts
    FROM documents WHERE doc_id < 500
  ), unnest(ts) AS t(term)
  WHERE t.term != ''
),
h AS (
  SELECT doc_id,
         (('0x' || substr(md5(term), 1, 15))::BIGINT % 1000000007)
           % 64 AS bucket,
         1 - 2 * (('0x' || substr(md5(term), 1, 15))::BIGINT % 2) AS s
  FROM toks
)
SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS weight
FROM h GROUP BY doc_id, bucket
HAVING SUM(s) != 0
""",
        "documents_proximity": """
-- positional replay: shared normalizing tokenizer, 0-based positions,
-- ordered gap in [1, 3]
WITH toks AS (
  SELECT doc_id, i AS pos, ts[CAST(i + 1 AS INT)] AS term
  FROM (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                        ' ') AS ts
    FROM documents
  ), unnest(range(len(ts))) AS r(i)
),
a AS (SELECT doc_id, pos AS pa FROM toks WHERE term = 'merge'),
b AS (SELECT doc_id, pos AS pb FROM toks WHERE term = 'join'),
m AS (
  SELECT a.doc_id, pb - pa AS gap
  FROM a JOIN b USING (doc_id)
  WHERE pb - pa BETWEEN 1 AND 3
)
SELECT doc_id, COUNT(*) AS n_matches, CAST(MIN(gap) AS BIGINT) AS min_gap
FROM m GROUP BY doc_id
""",
        "events_acf": """
-- sample ACF replay: CENTS-scale devs (milli lift -- the 1e6 lift
-- overflows the covariance numerator), pairs where both days exist,
-- variance over all days; negative covariances truncate identically
WITH r AS MATERIALIZED (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
m AS (SELECT event_type, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean
      FROM r GROUP BY 1),
d AS MATERIALIZED (
  SELECT r.event_type, day, cents - mean AS dev
  FROM r JOIN m USING (event_type)
),
v AS (SELECT event_type, CAST(SUM(dev * dev) AS BIGINT) AS var
      FROM d GROUP BY 1),
p AS (
  SELECT a.event_type, l.lag,
         CAST(SUM(a.dev * b.dev) AS BIGINT) AS cov,
         COUNT(*) AS n_pairs
  FROM d a
  CROSS JOIN unnest(range(1, 6)) AS l(lag)
  JOIN d b ON a.event_type = b.event_type AND b.day = a.day + l.lag
  GROUP BY 1, 2
)
SELECT p.event_type, CAST(lag AS BIGINT) AS lag,
       CAST((1000 * cov) // var AS BIGINT) AS acf_milli, n_pairs
FROM p JOIN v USING (event_type)
WHERE var > 0  -- constant series: ACF undefined, key dropped
""",
        "orders_seasonal_anomalies": """
-- composition replay: the seasonal_decompose chain, then the
-- integer-PINNED median/MAD flags (med2/mad4 doubling + ROUND --
-- engine medians drift a ULP at micro-cent magnitude)
WITH r AS MATERIALIZED (
  SELECT o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7
           AS wk,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
t AS MATERIALIZED (
  SELECT o_orderpriority, wk, cents * 1000000 AS x,
         CAST(SUM(cents * 1000000) OVER w AS BIGINT) AS fsum,
         COUNT(*) OVER w AS fn
  FROM r
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY wk
               RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
),
d AS MATERIALIZED (
  SELECT o_orderpriority, wk, x - fsum // 5 AS det, wk % 5 AS phase
  FROM t WHERE fn = 5
),
s AS MATERIALIZED (
  SELECT o_orderpriority, phase,
         CAST(SUM(det) // COUNT(*) AS BIGINT) AS seasonal_micro
  FROM d GROUP BY 1, 2
),
res AS MATERIALIZED (
  SELECT d.o_orderpriority, d.wk,
         CAST(d.det - s.seasonal_micro AS BIGINT) AS resid_micro
  FROM d JOIN s ON d.o_orderpriority = s.o_orderpriority
              AND d.phase = s.phase
),
med AS (SELECT o_orderpriority,
               CAST(ROUND(2 * MEDIAN(resid_micro)) AS BIGINT) AS med2
        FROM res GROUP BY 1),
dev AS (
  SELECT res.o_orderpriority, wk, resid_micro, med2,
         ABS(2 * resid_micro - med2) AS dev2
  FROM res JOIN med USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority, CAST(ROUND(2 * MEDIAN(dev2)) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT dev.o_orderpriority, dev.wk, dev.resid_micro, dev.med2, mad.mad4
FROM dev JOIN mad USING (o_orderpriority)
WHERE 2 * dev2 > 3 * mad4
""",
        "multimodal_video_avi": """
-- replay of the AVI round-trip: document bytes -> consecutive 6x6 RGB
-- frames (108 bytes each, row-major, <= 6 frames; ASCII corpus, chars
-- == bytes); every 2nd frame, per-channel mean in exact milli units;
-- fps/n_frames are pure functions of doc_id/length per
-- attach_avi_payload
WITH fr AS (
  SELECT doc_id, f, c,
         SUM(ord(substr(text, CAST(108 * f + 3 * k + c + 1 AS INT), 1)))
           AS s
  FROM documents,
       unnest(range(least(length(text) // 108, 6))) AS t(f),
       unnest(range(36)) AS u(k),
       unnest(range(3)) AS v(c)
  WHERE f % 2 = 0
  GROUP BY 1, 2, 3
)
SELECT fr.doc_id,
       CAST(least(length(d.text) // 108, 6) AS BIGINT) AS n_frames,
       CAST(5 + fr.doc_id % 3 AS BIGINT) AS fps,
       CAST(f AS BIGINT) AS frame_idx,
       CAST((1000 * MAX(CASE WHEN c = 0 THEN s END)) // 36 AS BIGINT)
         AS mean_r_milli,
       CAST((1000 * MAX(CASE WHEN c = 1 THEN s END)) // 36 AS BIGINT)
         AS mean_g_milli,
       CAST((1000 * MAX(CASE WHEN c = 2 THEN s END)) // 36 AS BIGINT)
         AS mean_b_milli
FROM fr JOIN documents d ON fr.doc_id = d.doc_id
GROUP BY fr.doc_id, d.text, f
""",
        "pipeline_cdc_chunks": PO.cdc_chunks_sql(),
        "pipeline_bigram_lm": PO.bigram_logprob_sql(),
        "pipeline_trigram_lm": PO.trigram_logprob_sql(),
        "pipeline_domain_caps": PO.domain_caps_sql(),
        "pipeline_kneser_ney_lm": PO.kneser_ney_sql(),
        "pipeline_dsir": PO.dsir_sql(),
        "documents_dup_lines": r"""
-- Gopher duplicate-line stats over the same deterministic 3/4-line
-- relayout (line3 repeats line1 for doc_id%3==0, doc_id%5==0 appends
-- a second line1); per-line occurrence counts via list functions,
-- exact integer milli divisions
WITH toks AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
laid AS (
  SELECT doc_id,
         array_to_string(t[1:6], ' ') AS l1,
         array_to_string(t[7:12], ' ') AS l2,
         CASE WHEN doc_id % 3 = 0 THEN array_to_string(t[1:6], ' ')
              ELSE array_to_string(t[13:18], ' ') END AS l3
  FROM toks
),
lined AS (
  SELECT doc_id,
         list_filter(list_transform(
           CASE WHEN doc_id % 5 = 0 THEN [l1, l2, l3, l1]
                ELSE [l1, l2, l3] END,
           x -> trim(x)), x -> x <> '') AS lines
  FROM laid
),
st AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(list_sum(list_transform(lines, x -> len(x))) AS BIGINT)
           AS n_line_chars,
         CAST(len(list_distinct(lines)) AS BIGINT) AS nd,
         CAST(COALESCE(list_sum(list_transform(list_distinct(lines),
              x -> (len(list_filter(lines, y -> y = x)) - 1) * len(x))), 0)
           AS BIGINT) AS xc
  FROM lined
  WHERE len(lines) > 0
)
SELECT doc_id, n_lines, n_line_chars,
       CAST(1000 * (n_lines - nd) // n_lines AS BIGINT)
         AS dup_line_frac_milli,
       CAST(1000 * xc // n_line_chars AS BIGINT)
         AS dup_line_char_frac_milli
FROM st
""",
        "documents_longest_repeats": r"""
-- the classical definition the doubling machinery must reproduce:
-- sort all suffixes as STRINGS, pair order-adjacent suffixes, LCP =
-- the largest j whose j-prefixes agree (monotone, so MAX over a
-- generate_series works), top-10 by the same total order
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS ntext
  FROM documents WHERE doc_id < 40 AND text IS NOT NULL
),
s AS (
  SELECT doc_id, pos,
         substr(ntext, CAST(pos + 1 AS INTEGER)) AS suf,
         len(ntext) - pos AS slen
  FROM (SELECT doc_id, unnest(range(0, len(ntext))) AS pos, ntext
        FROM d WHERE len(ntext) > 0)
),
o AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY suf, doc_id, pos) AS rn FROM s
),
p AS (
  SELECT a.doc_id AS a_doc, a.pos AS a_pos, b.doc_id AS b_doc,
         b.pos AS b_pos, a.suf AS asuf, b.suf AS bsuf,
         LEAST(a.slen, b.slen) AS m
  FROM o a JOIN o b ON b.rn = a.rn + 1
),
l AS (
  SELECT a_doc, a_pos, b_doc, b_pos,
         COALESCE(MAX(CASE WHEN substr(asuf, 1, CAST(j AS INTEGER))
                              = substr(bsuf, 1, CAST(j AS INTEGER))
                           THEN j END), 0) AS lcp
  FROM p LEFT JOIN LATERAL unnest(range(1, m + 1)) t(j) ON TRUE
  GROUP BY a_doc, a_pos, b_doc, b_pos
)
SELECT CAST(lcp AS BIGINT) AS lcp,
       a_doc, CAST(a_pos AS BIGINT) AS a_pos,
       b_doc, CAST(b_pos AS BIGINT) AS b_pos
FROM l
ORDER BY lcp DESC, a_doc, a_pos, b_doc, b_pos
LIMIT 10
""",
        "documents_suffix_ranks": r"""
-- suffix ranks by direct lexicographic DENSE_RANK over the 16-char
-- prefix of each suffix — the string-order ground truth the doubling
-- rounds must reproduce (sentinel-padded block comparison == string
-- comparison, the classical Manber-Myers argument)
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS ntext
  FROM documents WHERE doc_id < 60 AND text IS NOT NULL
),
p AS (
  SELECT doc_id, unnest(range(0, len(ntext))) AS pos, ntext
  FROM d WHERE len(ntext) > 0
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       CAST(DENSE_RANK() OVER
            (ORDER BY substr(ntext, CAST(pos + 1 AS INTEGER), 16))
         AS BIGINT) AS rank16
FROM p
""",
        "pipeline_recency_sample": r"""
-- recency-weighted keep: exp(-age/365) decay floored to micro-units
-- (one exact-BIGINT/constant division into EXP, IEEE-deterministic),
-- md5-uniform threshold replayed verbatim
WITH q AS (
  SELECT doc_id, lang,
         (doc_id * 7919) % 730 AS age_days,
         CAST(FLOOR(1000000 * EXP(-(CAST((doc_id * 7919) % 730 AS DOUBLE)
                                    / 365.0))) AS BIGINT) AS weight_micro,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 1000000 AS u
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id, CAST(age_days AS BIGINT) AS age_days, weight_micro, lang
FROM q WHERE u < weight_micro
""",
        "trade_graph_communities": PO.lpa_communities_sql(),
        "trade_graph_components": PO.trade_components_sql(),
        "orders_burst_components": PO.burst_components_sql(),
        "parts_copurchase_triangles": PO.copurchase_triangles_sql(),
        "customers_shared_supplier_jaccard": PO.shared_supplier_jaccard_sql(),
        "documents_pmi_collocations": PO.pmi_collocations_sql(),
        "parts_copurchase_clustering": PO.copurchase_clustering_sql(),
        "orders_psi_drift": PO.psi_drift_sql(),
        "trade_graph_kcore": PO.kcore_sql(),
        "pipeline_bpe_train": PO.bpe_train_sql(8),
        "pipeline_bpe_encode": PO.bpe_encode_sql(8),
        # same replay as ann_pq_top3: the sharded plan is value-identical
        "ann_pq_top3_sharded": PO.ann_pq_topk_sql(),
        "multimodal_image_resize_jpeg": _img_resize_jpeg_oracle(),
        # progressive transmission is lossless over the same quantized
        # coefficients, so the SAME reference-reconstruction VALUES
        # oracle pins the SOF2 path
        "multimodal_image_resize_jpeg_progressive": _img_resize_jpeg_oracle(),
        "regrid_conservative": O.regrid_oracle_sql("conservative"),
        # the general polygon-clipping builder on the same fixture pair —
        # identical closed-form oracle (same spherical-area measure)
        "regrid_conservative_clip": O.regrid_oracle_sql("conservative"),
        "regrid_bilinear_periodic": O.regrid_oracle_sql("bilinear", periodic=True),
        "regrid_bilinear_noperiodic": O.regrid_oracle_sql("bilinear", periodic=False),
        "regrid_unmapped": O.unmapped_cells_oracle_sql(),
        "regrid_patch": O.regrid_oracle_sql("patch", periodic=True),
        "regrid_nearest_s2d": O.regrid_oracle_sql("nearest_s2d"),
        "regrid_nearest_d2s": O.regrid_oracle_sql("nearest_d2s"),
        "regrid_bilinear_locstream": O.bilinear_locstream_oracle_sql(),
        "regrid_bilinear_curvilinear": O.bilinear_curvilinear_oracle_sql(),
        "regrid_patch_curvilinear": O.patch_curvilinear_oracle_sql(),
        "stream_regrid": O.stream_regrid_oracle_sql(),
        "regrid_dataset_multivar": O.regrid_multivar_oracle_sql(),
        "regrid_conservative_4d": O.regrid_4d_oracle_sql(),
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "tpch_q3_top10": """
SELECT l_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
        "tpch_q5_local_supplier": """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
        "tpch_q6_forecast": """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24.0
""",
        "tpch_q7_volume_shipping": """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
        "tpch_q14_promo": """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1.0 - l_discount)), 6) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
        "tpch_q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
        "tpch_q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 4) > 150.0
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
""",
        "tpch_q4_priority": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
        "tpch_q8_market_share": """
-- exact integer-units revenue (cents * (100 - discount_pct) is an
-- exact bigint in 1e-4-dollar units): the sum is order-independent
-- and the only doubles are final IEEE divisions identical on both
-- engines — no ROUND of an accumulation-order-dependent double sum
WITH j AS (
  SELECT year(o_orderdate) AS o_year, n_name,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS units
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
),
a AS (
  SELECT o_year,
         CAST(SUM(CASE WHEN n_name = 'NATION_1' THEN units ELSE 0 END) AS BIGINT) AS num_units,
         CAST(SUM(units) AS BIGINT) AS den_units
  FROM j GROUP BY o_year
)
SELECT o_year,
       CAST(num_units AS DOUBLE) / CAST(den_units AS DOUBLE) AS mkt_share,
       CAST(den_units AS DOUBLE) / 10000.0 AS total_revenue
FROM a
""",
        "tpch_q9_product_type": """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))) AS BIGINT)
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
""",
        "tpch_q12_priority_class": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
GROUP BY l_linestatus
""",
        "tpch_q13_order_distribution": """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
        "tpch_q17_small_qty": """
WITH li3 AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
),
wa AS (SELECT l_partkey, AVG(l_quantity) AS avg_qty FROM li3 GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
             / 700.0, 4) AS avg_yearly,
       COUNT(*) AS n_lines
FROM li3 JOIN wa USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
""",
        "tpch_q19_disjunctive": """
SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))) AS BIGINT)
            AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
        "tpch_q22_inactive_customers": """
WITH c AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n FROM c WHERE c_acctbal > 0.0)
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(cents) AS BIGINT) / 100.0 AS totacctbal
FROM c, t
WHERE cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= '2000-07-01')
GROUP BY c_nationkey
""",
        "tpch_q10_returned": """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
        # q2 shape: the oracle states the CORRELATED scalar-min subquery
        # verbatim; the Spark side decorrelates it into one window MIN —
        # the hash-compare proves the rewrite equivalent. cost is a
        # stored 2-decimal double MIN (no accumulation), bit-exact on
        # both engines; (s_acctbal, partkey, s_name) is a total order so
        # LIMIT 100 is deterministic.
        "tpch_q2_min_cost_supplier": """
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name AS nation,
       p_partkey AS partkey, p_name, cost
FROM offers o
JOIN supplier ON o.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON o.l_partkey = p_partkey
WHERE cost = (SELECT MIN(cost) FROM offers i WHERE i.l_partkey = o.l_partkey)
ORDER BY s_acctbal DESC, partkey ASC, s_name ASC
LIMIT 100
""",
        # q11 shape: HAVING vs a global scalar subquery; qty * cents is
        # an exact BIGINT so both sums are order-independent and the
        # threshold comparison multiplies through (never divides)
        "tpch_q11_important_parts": """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS BIGINT)
             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS u
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(u AS DOUBLE) / 100.0 AS part_value
FROM per_part
WHERE u * 1000 > (SELECT SUM(u) FROM per_part)
""",
        # q16 shape: NOT IN subquery (key is non-nullable, so the Spark
        # LEFT ANTI join is exactly equivalent) + COUNT(DISTINCT) per group
        "tpch_q16_supplier_count": """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'STANDARD'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
""",
        # q20 shape: nested IN subqueries + correlated 20%-of-total
        # threshold; quantity is integer-valued so q_ps * 5 > q_p is exact
        "tpch_q20_excess_shippers": """
WITH ship AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
),
per_ps AS (SELECT l_partkey, l_suppkey, SUM(qty) AS q_ps FROM ship GROUP BY 1, 2),
per_p AS (SELECT l_partkey, SUM(qty) AS q_p FROM ship GROUP BY 1)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
  AND s_suppkey IN (SELECT l_suppkey FROM per_ps
                    JOIN per_p USING (l_partkey)
                    WHERE q_ps * 5 > q_p)
""",
        # q21 shape: the oracle states the textbook EXISTS / NOT EXISTS
        # self-joins verbatim; the Spark side decorrelates both into
        # per-order distinct-supplier counts — the hash-compare proves
        # the rewrite. (numwait, s_name) is a total order (s_name is the
        # group key) so LIMIT 20 is deterministic.
        "tpch_q21_waiting_suppliers": """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_7'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
        "events_asof_join": """
WITH ev AS (
  SELECT event_id, user_id, EPOCH_NS(ts) AS tns, event_type, value FROM events
),
clicks AS (
  -- equal-(user, ts) clicks collapse to the max event_id (same
  -- deterministic tie rule as the Spark side)
  SELECT user_id, tns, MAX(event_id) AS click_id
  FROM ev WHERE event_type = 'click' GROUP BY user_id, tns
),
purch AS (
  SELECT event_id AS purchase_id, user_id, tns, value
  FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, c.click_id,
       p.tns - c.tns AS lag_ns,
       p.value AS value
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.tns >= c.tns
""",
        "events_interval_join": """
WITH ev AS (
  SELECT event_id, user_id, EPOCH_NS(ts) AS tns, event_type FROM events
),
purch AS (SELECT event_id AS purchase_id, user_id, tns FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT event_id AS click_id, user_id, tns FROM ev WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id, p.tns - c.tns AS lag_ns
FROM purch p JOIN clicks c
  ON p.user_id = c.user_id
 AND c.tns >= p.tns - 3600000000000
 AND c.tns <= p.tns
""",
        "stream_interval_join": """
WITH ev AS (
  -- the stream joins on event-time TIMESTAMPs at microsecond grain
  -- (contract ns // 1000), so the bound applies at µs; lag stays exact ns
  SELECT event_id, user_id, EPOCH_NS(ts) AS tns, EPOCH_NS(ts) // 1000 AS tus, event_type
  FROM events
),
purch AS (SELECT event_id AS purchase_id, user_id, tns, tus FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT event_id AS click_id, user_id, tns, tus FROM ev WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id, p.tns - c.tns AS lag_ns
FROM purch p JOIN clicks c
  ON p.user_id = c.user_id
 AND c.tus >= p.tus - 3600000000
 AND c.tus <= p.tus
""",
        "stream_interval_join_outer": """
WITH ev AS (
  -- LEFT OUTER stream-stream join: unmatched purchases flush when the
  -- watermark (advanced past every horizon by the staged sentinel)
  -- passes left_ts + upper; the finite run then equals this batch LEFT
  -- range join exactly. Bounds at µs (event-time grain), lag exact ns.
  SELECT event_id, user_id, EPOCH_NS(ts) AS tns, EPOCH_NS(ts) // 1000 AS tus, event_type
  FROM events
),
purch AS (SELECT event_id AS purchase_id, user_id, tns, tus FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT event_id AS click_id, user_id, tns, tus FROM ev WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id, p.tns - c.tns AS lag_ns
FROM purch p LEFT JOIN clicks c
  ON p.user_id = c.user_id
 AND c.tus >= p.tus - 3600000000
 AND c.tus <= p.tus
""",
        "events_props_flatten_udtf": """
-- polymorphic-UDTF replay, COERCION-EXACT: only JSON OBJECTS yield a
-- row (arrays/scalars are the yield-nothing quarantine, so the filter
-- is json_type = OBJECT, not mere json_valid), and bigint extraction
-- accepts JSON integers ONLY (json_type of the element in
-- BIGINT/UBIGINT — a JSON string "7" or a bool/double degrades to
-- NULL exactly as the UDTF's isinstance(v, int) check does)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                END) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN 1 END) AS n_k,
       CAST(SUM(len(json_keys(props))
                - CASE WHEN list_contains(json_keys(props), 'k') THEN 1 ELSE 0 END)
            AS BIGINT) AS sum_extra
FROM events
WHERE props IS NOT NULL AND json_valid(props) AND json_type(props) = 'OBJECT'
GROUP BY event_type
""",
        "events_continuous_rollup": """
-- the continuous-aggregate invariant: the oracle aggregates everything
-- FROM SCRATCH; the engine refreshes incrementally (two partial states
-- merged) — the hash-compare proves incremental == full recompute.
-- Exact integer partials (count + cents), one final division.
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
""",
        "stream_rollup": """
-- the STREAMING form of the continuous-aggregate invariant: the engine
-- maintained the rollup across 4 checkpointed micro-batches
-- (foreachBatch partial-agg + merge into versioned parquet state); the
-- oracle aggregates everything from scratch — the hash-compare proves
-- N-batch streaming maintenance == batch recompute exactly.
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
""",
        "documents_segments_udtf": r"""
-- the UDTF's row-fan-out replayed with list functions: same
-- delimiter (standalone-'a' stopword — the synthetic corpus has no
-- sentence punctuation), same empty-segment filter, same dense
-- 0-based seg_idx, same single-space token count
WITH p AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ ]a[ ]'),
                     x -> x <> '') AS parts
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS seg_idx,
       parts[i] AS segment,
       CAST(len(string_split(parts[i], ' ')) AS INT) AS n_tokens
FROM p, UNNEST(range(1, len(parts) + 1)) AS u(i)
""",
        "customers_upsert": """
-- MERGE semantics stated directly: updated keys replaced wholesale,
-- untouched keys kept, new key inserted; cents cast AFTER the +100.00
-- (same double add on both engines)
WITH up AS (
  SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + 100.0 AS c_acctbal,
         'UPGRADED' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 99999999, 'Customer#new', 0, 123.45, 'UPGRADED'
),
m AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM up)
  UNION ALL
  SELECT * FROM up
)
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM m
GROUP BY c_mktsegment
""",
        "events_pivot": """
-- long-to-wide with an explicit value list; COUNT(*) FILTER yields 0
-- for missing (hour, type) cells, matching the Spark-side coalesce
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY 1
""",
        "events_clicks_errors_full_outer": """
WITH c AS (
  SELECT EPOCH_NS(ts) // 3600000000000 AS hr, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
e AS (
  SELECT EPOCH_NS(ts) // 3600000000000 AS hr, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT COALESCE(c.hr, e.hr) AS epoch_hour, n_clicks, n_errors
FROM c FULL OUTER JOIN e ON c.hr = e.hr
""",
        "events_hourly_gapfill": """
WITH b AS (
  SELECT MIN(EPOCH_NS(ts) // 3600000000000) AS h0,
         MAX(EPOCH_NS(ts) // 3600000000000) AS h1
  FROM events
),
axis AS (SELECT UNNEST(generate_series(h0, h1)) AS epoch_hour FROM b),
kinds AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.epoch_hour, k.event_type, COALESCE(n, 0) AS n
FROM axis a
CROSS JOIN kinds k
LEFT JOIN counts c ON c.epoch_hour = a.epoch_hour AND c.event_type = k.event_type
""",
        "orders_rollup": """
WITH base AS (
  SELECT year(o_orderdate) AS o_year, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT o_year, o_orderpriority,
       CAST(GROUPING(o_year, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM base
GROUP BY ROLLUP (o_year, o_orderpriority)
""",
        "events_cube": """
WITH base AS (
  SELECT event_type, EPOCH_NS(ts) // 86400000000000 AS epoch_day, value FROM events
)
SELECT event_type, epoch_day,
       CAST(GROUPING(event_type, epoch_day) AS BIGINT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM base
GROUP BY CUBE (event_type, epoch_day)
""",
        "events_user_setops": """
WITH t0 AS (SELECT MIN(EPOCH_NS(ts)) AS t0 FROM events)
SELECT user_id FROM events, t0
WHERE event_type = 'click' AND EPOCH_NS(ts) < t0 + 172800000000000
INTERSECT
SELECT user_id FROM events, t0
WHERE event_type = 'purchase' AND EPOCH_NS(ts) < t0 + 172800000000000
EXCEPT
SELECT user_id FROM events, t0
WHERE event_type = 'error' AND EPOCH_NS(ts) < t0 + 43200000000000
""",
        "events_percentiles": """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
        "events_geomean_udaf": """
SELECT event_type,
       ROUND(EXP(AVG(LN(value))), 6) AS geomean_value,
       COUNT(*) AS n
FROM events
WHERE value > 0
GROUP BY event_type
""",
        "orders_above_customer_avg": """
-- Correlated-scalar form, but with an ORDER-INDEPENDENT mean and
-- ENGINE-INDEPENDENT rounding: o_totalprice has exactly 2 decimal
-- digits, so it converts to integer cents losslessly and SUM(cents)
-- is exact under any accumulation order (double sums are not — r5's
-- hash fail was a last-ulp sum-order divergence; ROUND on doubles also
-- disagrees between engines on shortest-repr-…5 values). The rounded
-- average is pure integer math — (200*S + n) // (2*n) is
-- round_half_up(S/(100n), 4)·10^4 — then one correctly-rounded double
-- division by 10^4, bit-identical to Spark. The filter multiplies
-- through by COUNT(*) so the comparison never divides at all.
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST((200 * s + n) // (2 * n) AS DOUBLE) / 10000.0 AS cust_avg
FROM (
  SELECT o1.o_orderkey, o1.o_custkey, o1.o_totalprice,
         CAST(CAST(o1.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         (SELECT CAST(SUM(CAST(CAST(o2.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
          FROM orders o2 WHERE o2.o_custkey = o1.o_custkey) AS s,
         (SELECT COUNT(*) FROM orders o2
          WHERE o2.o_custkey = o1.o_custkey) AS n
  FROM orders o1
)
WHERE cents * n > s
""",
        "orders_rank_in_customer": """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
  FROM orders
)
WHERE rnk <= 2
""",
        "customers_semi_open_orders": """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
        "events_sessionize": """
WITH base AS (
  SELECT user_id, value, ts, event_id, EPOCH_NS(ts) // 1000000000 AS sec FROM events
),
flagged AS (
  SELECT user_id, value,
         CASE WHEN LAG(sec) OVER w IS NULL
                OR sec - LAG(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM flagged
GROUP BY user_id
""",
        "events_hourly": """
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "events_props_stats": """
WITH kx AS (
  -- TRY_CAST + single integer extraction so non-integral or malformed
  -- k degrade to NULL exactly like Spark's get_json_object + cast,
  -- and weighted_value uses the SAME truncated integer k as sum_k
  SELECT event_type, value, TRY_CAST(props->>'$.k' AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(AVG(k), 7) AS avg_k,
       ROUND(SUM(value * CAST(k AS DOUBLE)), 4) AS weighted_value
FROM kx
GROUP BY event_type
""",
        "pipeline_exact_dedup": PO.exact_dedup_sql(),
        "pipeline_minhash_dedup": PO.minhash_dedup_sql(),
        "pipeline_dedup_groups": PO.dedup_groups_sql(),
        "pipeline_clean_corpus": PO.clean_corpus_sql(),
        "pipeline_simhash": PO.simhash_sql(),
        "pipeline_ngram_jaccard": PO.ngram_jaccard_sql(),
        "pipeline_text_stats": PO.text_stats_sql(),
        "pipeline_langid": PO.langid_ngram_sql(),
        "pipeline_fingerprint": PO.fingerprint_sql(),
        "pipeline_split": """
WITH s AS (
  SELECT lang, n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY split, lang
""",
        "events_sketch_accuracy": """
-- sketch values are engine-specific; the CONTRACT is value-checked:
-- exact distinct count must match, and the accuracy booleans must be
-- TRUE on the Spark side (the oracle asserts them as literals).
-- r7: the Spark booleans are now TRUE by construction at any scale —
-- 15% HLL cap (7.5 sigma of rsd=0.02) and a RANK-based percentile
-- bracket ([0.45,0.55], 500x the 1e-4 rank-error guarantee) — so the
-- literal-TRUE oracle is sound, not merely probable
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok,
       TRUE AS p50_ok
FROM events
GROUP BY event_type
""",
        "pipeline_scrub_pii": r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || doc_id || '@example.com at 10.0.'
                        || (doc_id % 256) || '.7 call 555-867-5309'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
       len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS scrubbed_key
FROM planted
""",
        "pipeline_repetition": r"""
WITH norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS ntext
  FROM documents
),
tk AS (SELECT doc_id, string_split(ntext, ' ') AS t FROM norm),
base AS (SELECT doc_id, t, len(t) AS n FROM tk WHERE len(t) > 0),
wb AS (
  SELECT doc_id, t, n,
         list_transform(generate_series(1, n - 1), i -> t[i] || ' ' || t[i + 1]) AS bg
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(len(list_distinct(t)) / CAST(n AS DOUBLE), 6) AS distinct_ratio,
       ROUND(list_max(list_transform(list_distinct(t),
                x -> len(list_filter(t, y -> y = x)))) / CAST(n AS DOUBLE), 6)
         AS top_token_frac,
       CASE WHEN n >= 2
            THEN ROUND(list_max(list_transform(list_distinct(bg),
                     x -> len(list_filter(bg, y -> y = x)))) / CAST(n - 1 AS DOUBLE), 6)
            ELSE NULL END AS top_bigram_frac
FROM wb
""",
        "documents_quality_tiers": f"""
WITH ts AS ({PO.text_stats_sql()}),
ranked AS (
  SELECT doc_id, quality,
         NTILE(4) OVER (ORDER BY quality ASC, doc_id ASC) AS tier,
         PERCENT_RANK() OVER (ORDER BY quality ASC, doc_id ASC) AS pr
  FROM ts
)
SELECT CAST(tier AS INT) AS tier,
       COUNT(*) AS n_docs,
       MIN(quality) AS min_quality,
       MAX(quality) AS max_quality,
       ROUND(MAX(pr), 6) AS max_pct_rank
FROM ranked
GROUP BY tier
""",
        "documents_quality_tiers_approx": """
-- sketch cutoff values are engine-specific; the CONTRACT is
-- value-checked (see the Spark docstring): exact corpus count routed
-- through the tier partition, plus booleans TRUE by construction
-- (CASE bounds) and by 3x margin over worst rank-error + tie mass
SELECT COUNT(*) AS total_docs, TRUE AS tiers_ok, TRUE AS frac_ok
FROM documents
""",
        "pipeline_editdist_dedup": f"""
WITH
{PO._docs_cte(True)},
nrm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
  FROM docs
),
blk0 AS (SELECT doc_id, ntext, substr(ntext, 1, 24) AS block FROM nrm),
-- skew valve mirror (pipeline.MAX_EDITDIST_BLOCK): blocks over 200
-- docs are excluded before the self-join on BOTH engines
bsz AS (SELECT block, COUNT(*) AS block_n FROM blk0 GROUP BY block),
blk AS (SELECT blk0.* FROM blk0 JOIN bsz USING (block) WHERE block_n <= 200),
rels AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.ntext, b.ntext) AS dist,
         -- empty-vs-empty normalized texts are exact duplicates:
         -- max(len)=0 is rel_dist 0.0, mirrored from the engine
         ROUND(CASE WHEN GREATEST(len(a.ntext), len(b.ntext)) = 0 THEN 0.0
                    ELSE levenshtein(a.ntext, b.ntext)
                         / CAST(GREATEST(len(a.ntext), len(b.ntext)) AS DOUBLE)
               END, 6) AS rel_dist
  FROM blk a
  JOIN blk b ON a.block = b.block AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, dist, rel_dist FROM rels WHERE rel_dist <= 0.2
""",
        "pipeline_curate": r"""
-- the composed curation chain: plant -> scrub -> repetition stats on
-- the SCRUBBED text -> quality gate -> stratified sample -> audit agg.
-- aggregates are order-independent (counts, exact bigint sums, min/max
-- of already-rounded ratios) — no AVG of doubles (r5 lesson)
WITH planted AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || doc_id || '@example.com at 10.0.'
                        || (doc_id % 256) || '.7 call 555-867-5309'
              ELSE text END AS text
  FROM documents
),
scrub AS (
  SELECT doc_id, lang,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS stext,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
           + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS n_pii
  FROM planted
),
tk AS (
  SELECT doc_id, lang, n_pii,
         string_split(lower(trim(regexp_replace(stext, '\s+', ' ', 'g'))), ' ') AS t
  FROM scrub
),
base AS (SELECT doc_id, lang, n_pii, t, len(t) AS n FROM tk WHERE len(t) > 0),
rep AS (
  SELECT doc_id, lang, n_pii,
         CAST(n AS BIGINT) AS n_tokens,
         ROUND(len(list_distinct(t)) / CAST(n AS DOUBLE), 6) AS dr,
         ROUND(list_max(list_transform(list_distinct(t),
                  x -> len(list_filter(t, y -> y = x)))) / CAST(n AS DOUBLE), 6) AS tf
  FROM base
),
kept AS (SELECT * FROM rep WHERE dr >= 0.4 AND tf <= 0.12),
samp AS (
  SELECT * FROM kept
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        CASE lang WHEN 'en' THEN '80000000'
                  WHEN 'fr' THEN 'g'
                  WHEN 'zh' THEN '33333333'
                  ELSE '19999999' END
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(dr) AS min_distinct,
       MAX(tf) AS max_topfrac,
       CAST(SUM(n_pii) AS BIGINT) AS sum_pii
FROM samp
GROUP BY lang
""",
        "pipeline_stratified_sample": """
WITH s AS (
  SELECT lang, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8,
         CASE lang WHEN 'en' THEN '80000000'
                   WHEN 'fr' THEN 'g'
                   WHEN 'zh' THEN '33333333'
                   ELSE '19999999' END AS bound
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
WHERE h8 < bound
GROUP BY lang
""",
        "pipeline_token_freq": r"""
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
""",
        "pipeline_chunks": r"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
ch AS (
  SELECT doc_id, k, t[CAST(k*12+1 AS INT) : CAST(k*12+16 AS INT)] AS ct
  FROM base, UNNEST(range((n - 1) // 12 + 1)) AS u(k)
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_idx,
       len(ct) AS n_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM ch
""",
        "pipeline_pack_contexts": r"""
-- concat-and-chop packing replayed from first principles: same
-- md5-derived shard + order, same running-offset window, same
-- spanned-context explode. Every output column is an integer count.
WITH base AS (
  SELECT doc_id,
         len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n,
         md5(CAST(doc_id AS VARCHAR)) AS ord_key,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
  FROM documents
  WHERE text IS NOT NULL
),
c AS (
  SELECT shard, doc_id, n,
         -- windowed SUM(BIGINT) is HUGEINT in DuckDB: cast back
         CAST(SUM(n) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                           ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS cum
  FROM base
),
x AS (
  SELECT shard, doc_id, n, cum,
         unnest(generate_series(cum // 64, (cum + n - 1) // 64)) AS ctx
  FROM c
)
SELECT shard,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(MAX(ctx) + 1 AS BIGINT) AS n_contexts,
       CAST(SUM(least((ctx + 1) * 64, cum + n) - greatest(ctx * 64, cum)) AS BIGINT)
         AS packed_tokens,
       COUNT(*) - COUNT(DISTINCT doc_id) AS span_crossings
FROM x
GROUP BY shard
""",
        "ann_cosine_top3": PO.ann_cosine_topk_sql(),
        "ann_ivf_top3": PO.ann_ivf_topk_sql(),
        "ann_ivf_multiprobe": PO.ann_ivf_topk_sql(k=3, n_centroids=16, n_probe=5),
        "pipeline_jsonl_roundtrip": """
-- the JSONL staging round-trip must reproduce the parquet corpus
-- exactly (corrupt planted lines quarantined), so the oracle audits
-- the SOURCE directly: per-language count, char sum, exact mod-P
-- text-hash sum (same md5-derived hash as pipeline.base_hash)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY lang
""",
        "pipeline_manifest_sink_roundtrip": """
-- the manifest-committed sink must reproduce the corpus exactly and
-- the planted uncommitted part must be invisible (manifest, not
-- directory listing, is the source of truth — stated as literal TRUE)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum,
       TRUE AS orphan_invisible
FROM documents
GROUP BY lang
""",
        "pipeline_compact_small_files": """
-- compaction must preserve content exactly, so the oracle audits the
-- SOURCE (same audit as the format round-trips); the file-count
-- contract is a driver-side listing check stated as literal TRUE
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum,
       TRUE AS compaction_ok
FROM documents
GROUP BY lang
""",
        "pipeline_orc_roundtrip": """
-- the ORC staging round-trip must reproduce the parquet corpus
-- exactly, so the oracle audits the SOURCE directly (same audit as
-- the JSONL/CSV round-trips)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY lang
""",
        "events_zorder_scan": """
-- the z-order layout must round-trip values exactly: the oracle
-- slices the source with the same first-decile user_id predicate.
-- The footer-skipping contract is a driver-side parquet-metadata
-- check stated as the literal TRUE the layout guarantees.
WITH b AS (
  SELECT MIN(user_id) AS mn,
         MIN(user_id) + (MAX(user_id) - MIN(user_id)) // 10 AS hi
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_value,
       TRUE AS zorder_user_ok,
       TRUE AS zorder_ts_ok
FROM events, b
WHERE user_id BETWEEN b.mn AND b.hi
GROUP BY event_type
""",
        "events_partitioned_scan": """
-- the Hive-partitioned staging layout must round-trip values exactly:
-- the oracle slices the UNPARTITIONED source with the same two-type +
-- first-day predicate. Integer-exact hourly aggregate (count + cents).
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_value
FROM events
WHERE event_type IN ('click', 'error')
  AND EPOCH_NS(ts) < (SELECT MIN(EPOCH_NS(ts)) FROM events)
                     + 24 * 3600000000000
GROUP BY 1, 2
""",
        "events_hll_merge": """
-- sketch values are engine-specific; the value-checked CONTRACT is:
-- exact distincts (exact), merged-vs-direct estimates within 5% of
-- each other (the union gadget diverges from the direct sketch, so
-- identity would be a false guarantee), and a many-sigma accuracy
-- bound on the merged estimate
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS merge_consistent,
       TRUE AS hll_merged_ok
FROM events
GROUP BY event_type
""",
        "events_trailing_window": """
-- RANGE frame keyed by VALUE distance on the integer day — correct
-- across calendar gaps where a ROWS frame would over-reach. Same
-- integer-partials discipline; the windowed BIGINT sums come back
-- HUGEINT in DuckDB, so cast.
WITH daily AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS epoch_day,
         event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY 1, 2
)
SELECT epoch_day,
       event_type,
       n,
       CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(cents) OVER w AS BIGINT) / 100.0 AS sum_value_7d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
        "pipeline_weighted_sample": r"""
-- quality-weighted keep: md5 uniform (micro-units) vs the integer
-- distinct-token-ratio score, replayed verbatim
WITH q AS (
  SELECT doc_id, lang,
         CAST((1000000 * len(list_distinct(
                 string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))))
              // len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
           AS BIGINT) AS qm_micro,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS u
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id, lang, qm_micro FROM q WHERE u < qm_micro
""",
        "pipeline_token_budget": r"""
-- highest-quality strict prefix per shard until budget/n_shards
-- (20000/4 = 5000) tokens: same deterministic ordering, same ROWS
-- running total, windowed SUM cast back from HUGEINT
WITH toks AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
  FROM documents
  WHERE text IS NOT NULL
),
base AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         CAST((1000000 * len(list_distinct(t))) // len(t) AS BIGINT) AS qm_micro,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 4 AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS ord_key
  FROM toks
),
c AS (
  SELECT shard, doc_id, qm_micro, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard
                                  ORDER BY qm_micro DESC, ord_key, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM base
  WHERE n_tokens >= 1
)
SELECT shard, doc_id, qm_micro, n_tokens, cum_tokens
FROM c
WHERE cum_tokens <= 5000
""",
        "pipeline_simhash_pairs": PO.simhash_pairs_sql(bits=60),
        "pipeline_unigram_quality": PO.unigram_logprob_sql(),
        "pipeline_nb_quality": PO.nb_quality_sql(),
        "documents_winnowing": PO.winnowing_sql(),
        "documents_query_likelihood": PO.query_likelihood_sql(),
        "orders_holt_forecast": PO.holt_sql(),
        "events_attribution": PO.attribution_sql(),
        "documents_rake": PO.rake_sql(),
        "events_ccf": PO.ccf_sql(),
        "stream_sliding": """
WITH e AS (
  SELECT (EPOCH_NS(ts) // 3600000000000) * 3600 AS hr, event_type, value
  FROM events
),
x AS (
  SELECT hr - o.off AS epoch_sec, event_type, value
  FROM e, UNNEST([0, 3600]) AS o(off)
)
SELECT epoch_sec, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM x GROUP BY 1, 2
""",
        "pipeline_decontaminate": PO.decontaminate_sql(),
        "pipeline_decontaminate_fuzzy": PO.decontaminate_fuzzy_sql(),
        "pipeline_span_dedup": PO.span_dedup_sql(),
        "pipeline_span_dedup_multilevel": PO.span_dedup_multilevel_sql(),
        "pipeline_exactsubstr": PO.span_dedup_multilevel_sql(
            levels=((13, 8), (26, 4)), exact_run=50, rare_quote=True
        ),
        "pipeline_unigram_tok": PO.unigram_train_sql(),
        "trade_graph_shortest_paths": PO.shortest_paths_sql(),
        "pipeline_mixture_sample": PO.mixture_sample_sql(),
        "documents_hybrid_rrf": PO.hybrid_rrf_sql(),
        "orders_ks_drift": PO.ks_drift_sql(),
        "orders_w1_drift": PO.w1_drift_sql(),
        "nations_trade_hits": PO.hits_sql(iters=3),
        "ann_sq8_top3": PO.sq8_topk_sql(k=3),
        "documents_textrank": PO.textrank_sql(iters=3, k=20),
        "pipeline_containment": PO.containment_sql(min_micro=600_000),
        "ann_mmr_top3": PO.mmr_topk_sql(k=3, pool_k=8),
        "pipeline_split_grouped": PO.grouped_split_sql(threshold=0.5),
        "stream_psi_drift": PO.psi_drift_events_sql(),
        "nations_trade_pagerank_weighted": PO.pagerank_weighted_sql(iters=3),
        "lineitem_correlations": """
-- one-pass moment sums in exact BIGINTs, identical double tail
WITH m AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 10000
           AS price_husd,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_centi
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty) AS BIGINT) AS sx,
         CAST(SUM(qty * qty) AS BIGINT) AS qx,
         CAST(SUM(price_husd) AS BIGINT) AS sy,
         CAST(SUM(price_husd * price_husd) AS BIGINT) AS qy,
         CAST(SUM(disc_centi) AS BIGINT) AS sz,
         CAST(SUM(disc_centi * disc_centi) AS BIGINT) AS qz,
         CAST(SUM(qty * price_husd) AS BIGINT) AS pxy,
         CAST(SUM(qty * disc_centi) AS BIGINT) AS pxz,
         CAST(SUM(price_husd * disc_centi) AS BIGINT) AS pyz
  FROM m
)
SELECT 'qty' AS col_x, 'price_husd' AS col_y, n,
       CASE WHEN n*qx - sx*sx > 0 AND n*qy - sy*sy > 0 THEN
         CAST(FLOOR(1000000.0 * (CAST(n*pxy - sx*sy AS DOUBLE)
           / SQRT(CAST(n*qx - sx*sx AS DOUBLE)
                  * CAST(n*qy - sy*sy AS DOUBLE)))) AS BIGINT)
       END AS corr_micro
FROM s
UNION ALL
SELECT 'qty', 'disc_centi', n,
       CASE WHEN n*qx - sx*sx > 0 AND n*qz - sz*sz > 0 THEN
         CAST(FLOOR(1000000.0 * (CAST(n*pxz - sx*sz AS DOUBLE)
           / SQRT(CAST(n*qx - sx*sx AS DOUBLE)
                  * CAST(n*qz - sz*sz AS DOUBLE)))) AS BIGINT)
       END
FROM s
UNION ALL
SELECT 'price_husd', 'disc_centi', n,
       CASE WHEN n*qy - sy*sy > 0 AND n*qz - sz*sz > 0 THEN
         CAST(FLOOR(1000000.0 * (CAST(n*pyz - sy*sz AS DOUBLE)
           / SQRT(CAST(n*qy - sy*sy AS DOUBLE)
                  * CAST(n*qz - sz*sz AS DOUBLE)))) AS BIGINT)
       END
FROM s
""",
        "orders_snapshot_diff": """
-- replay both snapshot versions' expected content from orders:
-- v2 = all rows (append+append); v3 = overwrite to 'F' rows with
-- cents+1 on %5 keys => per-key status is a pure projection
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS st FROM orders
),
d AS (
  SELECT k, CASE WHEN st != 'F' THEN 'removed'
                 WHEN k % 5 = 0 THEN 'changed'
                 ELSE 'unchanged' END AS diff_status
  FROM o
)
SELECT diff_status, COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS sum_keys
FROM d GROUP BY diff_status
""",
        "ann_sq8_recall": f"""
WITH exact_q AS ({PO.ann_euclid_topk_sql()}),
approx_q AS ({PO.sq8_topk_sql()}),
m AS (
  SELECT COUNT(*) AS n_matched
  FROM exact_q e JOIN approx_q a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
),
e AS (SELECT COUNT(*) AS n_exact FROM exact_q)
SELECT ROUND(CAST(n_matched AS DOUBLE) / n_exact, 6) AS recall_at_3,
       n_exact, n_matched
FROM e, m
""",
        "documents_char_entropy": """
-- integer micro-nat replay: identical double expression per distinct
-- character, exact BIGINT arithmetic after (order-independent sums)
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
per AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars,
         COUNT(*) AS n_distinct_chars,
         CAST(SUM(CAST(FLOOR(1000000.0 * (CAST(cnt AS DOUBLE)
              * LN(CAST(cnt AS DOUBLE)))) AS BIGINT)) AS BIGINT) AS s
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_chars, n_distinct_chars,
       CAST(FLOOR(1000000.0 * LN(CAST(n_chars AS DOUBLE))) AS BIGINT)
         - s // n_chars AS entropy_micro
FROM agg
""",
        "pipeline_unigram_encode": PO.unigram_encode_sql(),
        "documents_heavy_hitters": PO.heavy_hitters_sql(),
        "stream_heavy_hitters": PO.heavy_hitters_sql(),
        "ann_pq_top3": PO.ann_pq_topk_sql(),
        "ann_ivfpq_top3": PO.ann_ivfpq_topk_sql(),
        "ann_ivfpq_refine_top3": PO.ann_ivfpq_refine_topk_sql(),
        "ann_ivfpq_refine_recall": f"""
WITH exact_q AS ({PO.ann_euclid_topk_sql()}),
approx_q AS ({PO.ann_ivfpq_refine_topk_sql()}),
m AS (
  SELECT COUNT(*) AS n_matched
  FROM exact_q e JOIN approx_q a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
),
e AS (SELECT COUNT(*) AS n_exact FROM exact_q)
SELECT ROUND(CAST(n_matched AS DOUBLE) / n_exact, 6) AS recall_at_3,
       n_exact, n_matched
FROM e, m
""",
        "ann_pq_recall": f"""
WITH exact_q AS ({PO.ann_euclid_topk_sql()}),
approx_q AS ({PO.ann_pq_topk_sql()}),
m AS (
  SELECT COUNT(*) AS n_matched
  FROM exact_q e JOIN approx_q a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
),
e AS (SELECT COUNT(*) AS n_exact FROM exact_q)
SELECT ROUND(CAST(n_matched AS DOUBLE) / n_exact, 6) AS recall_at_3,
       n_exact, n_matched
FROM e, m
""",
        "pipeline_csv_roundtrip": """
-- the CSV staging round-trip must reproduce the parquet corpus
-- exactly (planted corrupt rows quarantined via the null-field
-- filter), so the oracle audits the SOURCE directly — same exact
-- mod-P text-hash-sum audit as the JSONL round-trip
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum
FROM documents
GROUP BY lang
""",
        "multimodal_frame_sample": """
-- substring replay of the fixed-stride chunker: payload bytes are the
-- utf-8 text (ASCII corpus, chars == bytes), frames are every 4th
-- 64-byte chunk, short tail only when the doc is shorter than one
-- frame (n_frames = greatest(1, len // 64) full chunks otherwise)
WITH fr AS (
  SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
         substr(text, CAST(k * 64 + 1 AS INT), 64) AS frame
  FROM documents,
       UNNEST(generate_series(0, greatest(1, length(text) // 64) - 1)) AS t(k)
  WHERE k % 4 = 0
)
SELECT doc_id, frame_idx,
       CAST(length(frame) AS BIGINT) AS n_bytes,
       md5(frame) AS frame_md5
FROM fr
""",
        "stream_synthetic_source": """
-- the streamed union must equal the batch generator corpus exactly
-- (exactly-once offsets): symbolic replay of doc 0..2999, no filter
WITH ids AS (
  SELECT CAST(t.d AS BIGINT) AS doc_id FROM range(0, 3000) t(d)
),
docs AS (
  SELECT doc_id,
         array_to_string(
           list_transform(range(5 + CAST(doc_id % 7 AS BIGINT)),
                          i -> 'w' || CAST((doc_id * 13 + i * 7) % 97 AS VARCHAR)),
           ' ') AS text
  FROM ids
)
SELECT doc_id % 10 AS grp,
       COUNT(*) AS n_docs,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum
FROM docs
GROUP BY grp
""",
        "synthetic_source_scan": """
-- symbolic replay of the Python data source's generator: document d
-- has 5 + d%7 tokens, token i = 'w' || (d*13 + i*7) % 97; the pushed
-- doc_id range [200, 4200) bounds generation on both engines
WITH ids AS (
  SELECT CAST(t.d AS BIGINT) AS doc_id FROM range(200, 4200) t(d)
),
docs AS (
  SELECT doc_id,
         array_to_string(
           list_transform(range(5 + CAST(doc_id % 7 AS BIGINT)),
                          i -> 'w' || CAST((doc_id * 13 + i * 7) % 97 AS VARCHAR)),
           ' ') AS text
  FROM ids
)
SELECT doc_id % 10 AS grp,
       COUNT(*) AS n_docs,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_hash_sum
FROM docs
GROUP BY grp
""",
        "events_props_variant": """
-- VARIANT-path replay, coercion-exact: objects only, and k sums only
-- where the JSON element is an integer (the schema_of_variant gate)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                END) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN 1 END) AS n_k
FROM events
WHERE props IS NOT NULL AND json_valid(props) AND json_type(props) = 'OBJECT'
GROUP BY event_type
""",
        "events_rollup_hll_distinct": """
-- the count partial must merge EXACTLY (n == from-scratch COUNT(*));
-- the sketch leg is the bounded-gap contract stated as literal TRUE
SELECT EPOCH_NS(ts) // 86400000000000 AS bucket,
       event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok
FROM events
GROUP BY 1, 2
""",
        "events_funnel": """
-- same min-based recurrence as chained per-step aggregates:
-- t1 = earliest view; t_i = earliest step-i event >= t_{i-1} and
-- <= t1 + 7 days. Order-free (pure minima), so ties are benign.
WITH u1 AS (
  SELECT user_id, MIN(EPOCH_NS(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
u2 AS (
  SELECT e.user_id, u1.t1, MIN(EPOCH_NS(e.ts)) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'click'
    AND EPOCH_NS(e.ts) >= u1.t1
    AND EPOCH_NS(e.ts) <= u1.t1 + 604800000000000
  GROUP BY e.user_id, u1.t1
),
u3 AS (
  SELECT e.user_id, MIN(EPOCH_NS(e.ts)) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase'
    AND EPOCH_NS(e.ts) >= u2.t2
    AND EPOCH_NS(e.ts) <= u2.t1 + 604800000000000
  GROUP BY e.user_id
)
SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM u1) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM u2)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM u3)
""",
        "orders_incr_join_view": """
-- oracle = the from-scratch join of the FULL tables: the incremental
-- refresh identity delta(L JOIN R) = dLxR u Lxd R u dLxdR must make
-- base-view + deltas equal the full re-join exactly
SELECT c_nationkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
        "lineitem_bloom_prune_join": """
-- oracle = the PLAIN join + aggregation: the bloom prune is a
-- no-false-negative superset filter, so the pruned-then-joined plan's
-- contract is exact value-equivalence to the ordinary equi-join
WITH dim AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.0
)
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)))
            AS BIGINT) / 10000.0 AS revenue
FROM lineitem JOIN dim ON l_orderkey = o_orderkey
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "salted_join_skew": """
-- oracle = the PLAIN (unsalted) join: the salted plan's contract is
-- exact value-equivalence to ordinary equi-join semantics
WITH o AS (
  SELECT CASE WHEN o_custkey % 50 = 0 THEN 0 ELSE o_custkey END AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
c AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN 0 ELSE c_custkey END AS k, c_nationkey
  FROM customer
)
SELECT c_nationkey,
       COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM o JOIN c USING (k)
GROUP BY c_nationkey
""",
        "multimodal_image_resize": _IMG_RESIZE_ORACLE,
        "multimodal_image_resize_bilinear": _img_resize_bilinear_oracle(),
        # identical recompute: the payload format (BMP vs PNG, cycling
        # scanline filters) must be invisible to the decoded bytes
        "multimodal_image_resize_png": _IMG_RESIZE_ORACLE,
        "ann_ivf_recall": f"""
WITH exact_q AS ({PO.ann_cosine_topk_sql()}),
approx_q AS ({PO.ann_ivf_topk_sql()}),
m AS (
  SELECT COUNT(*) AS n_matched
  FROM exact_q e JOIN approx_q a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
),
e AS (SELECT COUNT(*) AS n_exact FROM exact_q)
SELECT ROUND(CAST(n_matched AS DOUBLE) / n_exact, 6) AS recall_at_3,
       n_exact, n_matched
FROM e, m
""",
        "ann_embedding_dedup": PO.embedding_dedup_sql(),
        "ann_lsh_dedup": PO.lsh_dedup_sql(),
        "multimodal_features": PO.multimodal_features_sql(),
        "multimodal_audio_windows": """
WITH s AS (
  -- byte pairs as PCM16 LE: ASCII corpus, so ord(char) == byte value
  SELECT doc_id, k,
         ord(substr(text, CAST(2*k+1 AS INT), 1))
           + 256 * ord(substr(text, CAST(2*k+2 AS INT), 1)) AS u
  FROM documents, UNNEST(generate_series(0, length(text)//2 - 1)) AS t(k)
),
sg AS (
  SELECT doc_id, k, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x FROM s
),
w AS (SELECT doc_id, CAST(k // 32 AS INT) AS window_idx, k, x FROM sg),
lagged AS (
  SELECT doc_id, window_idx, x,
         LAG(x) OVER (PARTITION BY doc_id, window_idx ORDER BY k) AS px
  FROM w
)
SELECT doc_id, window_idx,
       COUNT(*) AS n_samples,
       ROUND(SQRT(AVG(CAST(x AS DOUBLE) * x)), 6) AS rms,
       ROUND(COALESCE(AVG(CASE WHEN px IS NULL THEN NULL
                               WHEN (x >= 0) != (px >= 0) THEN 1.0
                               ELSE 0.0 END), 0.0), 6) AS zcr
FROM lagged
GROUP BY doc_id, window_idx
""",
        "multimodal_audio_resample": """
-- exact integer replay of the linear-interp resample: DOUBLED mono
-- numerators w (stereo pair sums / 2x mono), scaled resample
-- numerator W = w0*(8000-rem) + w1*rem — all BIGINT until the final
-- rms division (cast-to-double FIRST, then /n, matching the kernel)
WITH s AS (
  SELECT doc_id, k,
         ord(substr(text, CAST(2*k+1 AS INT), 1))
           + 256 * ord(substr(text, CAST(2*k+2 AS INT), 1)) AS u
  FROM documents, UNNEST(generate_series(0, length(text)//2 - 1)) AS t(k)
),
sg AS (
  SELECT doc_id, k, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x FROM s
),
m AS (
  SELECT doc_id, k AS j, CAST(2 * x AS BIGINT) AS w
  FROM sg WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id, k // 2 AS j, CAST(SUM(x) AS BIGINT) AS w
  FROM sg WHERE doc_id % 2 = 0
  GROUP BY doc_id, k // 2
  HAVING COUNT(*) = 2
),
meta AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sr_in
  FROM m GROUP BY doc_id
),
idx AS (
  SELECT doc_id, n, sr_in, CAST(t.j2 AS BIGINT) AS j2,
         (CAST(t.j2 AS BIGINT) * sr_in) // 8000 AS x0,
         (CAST(t.j2 AS BIGINT) * sr_in) % 8000 AS rem
  FROM meta, UNNEST(generate_series(0, (n - 1) * 8000 // sr_in)) AS t(j2)
),
res AS (
  SELECT i.doc_id, i.sr_in, i.n, i.j2,
         m0.w * (8000 - i.rem) + m1.w * i.rem AS W
  FROM idx i
  JOIN m m0 ON m0.doc_id = i.doc_id AND m0.j = i.x0
  JOIN m m1 ON m1.doc_id = i.doc_id AND m1.j = LEAST(i.x0 + 1, i.n - 1)
),
win AS (
  SELECT doc_id, sr_in, n, (n - 1) * 8000 // sr_in + 1 AS n_out,
         CAST(j2 // 32 AS INT) AS window_idx, j2, W
  FROM res
),
lagged AS (
  SELECT doc_id, sr_in, n, n_out, window_idx, W,
         LAG(W) OVER (PARTITION BY doc_id, window_idx ORDER BY j2) AS pw
  FROM win
)
SELECT doc_id, sr_in, n AS n_in, n_out, window_idx,
       COUNT(*) AS n_samples,
       SQRT(CAST(SUM(W * W) AS DOUBLE) / COUNT(*)) AS rms_scaled,
       ROUND(COALESCE(AVG(CASE WHEN pw IS NULL THEN NULL
                               WHEN (W >= 0) != (pw >= 0) THEN 1.0
                               ELSE 0.0 END), 0.0), 6) AS zcr
FROM lagged
GROUP BY doc_id, sr_in, n, n_out, window_idx
""",
        "multimodal_audio_wav": """
-- replay of the WAV round-trip: byte pairs as PCM16 LE samples (ASCII
-- corpus, chars == bytes); even doc_ids are stereo (consecutive sample
-- pairs -> frames, odd tail dropped, mean downmix), odd doc_ids mono;
-- header fields are pure functions of doc_id per attach_wav_payload
WITH s AS (
  SELECT doc_id, k,
         ord(substr(text, CAST(2*k+1 AS INT), 1))
           + 256 * ord(substr(text, CAST(2*k+2 AS INT), 1)) AS u
  FROM documents, UNNEST(generate_series(0, length(text)//2 - 1)) AS t(k)
),
sg AS (
  SELECT doc_id, k, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x FROM s
),
mono AS (
  SELECT doc_id, k AS j, CAST(x AS DOUBLE) AS v
  FROM sg WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id, k // 2 AS j, AVG(CAST(x AS DOUBLE)) AS v
  FROM sg WHERE doc_id % 2 = 0
  GROUP BY doc_id, k // 2
  HAVING COUNT(*) = 2
),
w AS (SELECT doc_id, CAST(j // 32 AS INT) AS window_idx, j, v FROM mono),
lagged AS (
  SELECT doc_id, window_idx, v,
         LAG(v) OVER (PARTITION BY doc_id, window_idx ORDER BY j) AS pv
  FROM w
)
SELECT doc_id,
       CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_channels,
       window_idx,
       COUNT(*) AS n_samples,
       ROUND(SQRT(AVG(v * v)), 6) AS rms,
       ROUND(COALESCE(AVG(CASE WHEN pv IS NULL THEN NULL
                               WHEN (v >= 0) != (pv >= 0) THEN 1.0
                               ELSE 0.0 END), 0.0), 6) AS zcr
FROM lagged
GROUP BY doc_id, window_idx
""",
        "knn_top3": O.knn_topk_oracle_sql(),
        "stream_hourly": """
SELECT (EPOCH_NS(ts) // 3600000000000) * 3600 AS epoch_sec,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "stream_sessionize": """
WITH base AS (SELECT user_id, EPOCH_NS(ts) AS tns, value FROM events),
flagged AS (
  SELECT user_id, tns, value,
         CASE WHEN LAG(tns) OVER w IS NULL OR tns - LAG(tns) OVER w > 1800000000000
              THEN 1 ELSE 0 END AS new_s
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tns)
),
sess AS (
  SELECT user_id, tns, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(tns) AS session_start,
       MAX(tns) AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM sess
GROUP BY user_id, sid
""",
        "stream_dedup": """
-- the staged source is one file => one micro-batch starting at
-- watermark 0, so dropDuplicatesWithinWatermark emits exactly one row
-- per distinct normalized-content digest (no late drops, no state
-- expiry mid-run); the emitted key set is deterministic even though
-- the surviving representative row is engine-internal
SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_key
FROM documents
""",
        "events_retention_cohorts": """
WITH ev AS (SELECT user_id, EPOCH_NS(ts) AS tns FROM events),
firsts AS (
  SELECT user_id, MIN(tns) // 86400000000000 AS cohort_period
  FROM ev GROUP BY user_id
)
SELECT cohort_period,
       e.tns // 86400000000000 - cohort_period AS offset_periods,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
        "events_session_paths": """
WITH ev AS (SELECT user_id, EPOCH_NS(ts) AS tns, event_type FROM events),
lagged AS (
  SELECT event_type,
         LAG(event_type) OVER w AS prev_type,
         tns - LAG(tns) OVER w AS gap
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns)
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM lagged
WHERE prev_type IS NOT NULL AND gap <= 1800000000000
GROUP BY 1, 2
""",
        "orders_topk_per_group": """
-- the operator's contract: partial-top-k + final window == the plain
-- window rank under the same (cents DESC, orderkey ASC) total order
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DESC,
                    o_orderkey
         ) AS rnk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, price_cents, CAST(rnk AS INT) AS rank_in_group
FROM ranked WHERE rnk <= 3
""",
        "customers_scd2": """
WITH changes AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderpriority) AS priority
  FROM orders GROUP BY 1, 2
),
dedup AS (
  SELECT o_custkey, o_orderdate, priority,
         LAG(priority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev_p
  FROM changes
),
kept AS (
  SELECT o_custkey, o_orderdate, priority FROM dedup
  WHERE prev_p IS NULL OR prev_p <> priority
),
hist AS (
  SELECT o_custkey, priority, o_orderdate AS vf,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS vt
  FROM kept
)
SELECT o_custkey, priority,
       STRFTIME(vf, '%Y-%m-%d') AS valid_from,
       STRFTIME(vt, '%Y-%m-%d') AS valid_to,
       vt IS NULL AS is_current
FROM hist WHERE o_custkey % 7 = 0
""",
        "customers_upsert_delete": """
-- MERGE with tombstones: keys in the change batch drop their base row
-- (any op); only non-delete change rows re-enter. cents BIGINT money.
WITH base AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
),
changes AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, acctbal_cents,
         'delete' AS op
  FROM base WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_nationkey, 'MIGRATED', acctbal_cents + 100000,
         'upsert'
  FROM base WHERE c_custkey % 7 = 1
  UNION ALL
  SELECT -c_custkey, c_nationkey, 'NEWSEG', CAST(0 AS BIGINT), 'upsert'
  FROM base WHERE c_custkey % 7 = 2
)
SELECT b.c_custkey, b.c_nationkey, b.c_mktsegment, b.acctbal_cents
FROM base b
WHERE b.c_custkey NOT IN (SELECT c_custkey FROM changes)
UNION ALL
SELECT c_custkey, c_nationkey, c_mktsegment, acctbal_cents
FROM changes WHERE op <> 'delete'
""",
        "events_concurrent_sessions": """
-- global-running-sum replay of the distributed two-phase scan:
-- carry_in + local_max per bucket == the max of ONE global running
-- sum restricted to the bucket (the decomposition identity)
WITH ev AS (SELECT user_id, EPOCH_NS(ts) AS tns FROM events),
lagd AS (
  SELECT user_id, tns,
         LAG(tns) OVER (PARTITION BY user_id ORDER BY tns) AS prev
  FROM ev
),
marks AS (
  SELECT user_id, tns,
         CASE WHEN prev IS NULL OR tns - prev > 1800000000000
              THEN 1 ELSE 0 END AS newf
  FROM lagd
),
sids AS (
  SELECT user_id, tns,
         SUM(newf) OVER (PARTITION BY user_id ORDER BY tns
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
),
sess AS (
  SELECT user_id, sid, MIN(tns) AS s, MAX(tns) + 60000000000 AS e
  FROM sids GROUP BY 1, 2
),
pts AS (
  SELECT s AS ts, 1 AS d FROM sess
  UNION ALL
  SELECT e AS ts, -1 AS d FROM sess
),
ipts AS (
  SELECT ts, CAST(SUM(d) AS BIGINT) AS d FROM pts GROUP BY ts
),
run AS (
  SELECT ts, d,
         SUM(d) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS r
  FROM ipts
)
SELECT ts // 3600000000000 AS epoch_hour,
       CAST(MAX(GREATEST(r, CASE WHEN ts % 3600000000000 = 0
                                 THEN r ELSE r - d END)) AS BIGINT)
         AS max_concurrent
FROM run GROUP BY 1
""",
        "orders_table_diff": """
-- planted-drift replay: status per key is closed-form, so the diff
-- operator's full-outer NULL-safe classification must reproduce it
WITH st AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 13 = 0 THEN 'removed'
              WHEN o_orderkey % 13 = 1 THEN 'changed'
              ELSE 'unchanged' END AS s
  FROM orders
  UNION ALL
  SELECT -o_orderkey, 'added' FROM orders WHERE o_orderkey % 13 = 2
)
SELECT s AS diff_status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
FROM st GROUP BY 1
""",
        "orders_priority_pit": """
-- native ASOF LEFT JOIN over the same sparse change stream: the
-- operator's backward walk must equal the engine's built-in PIT join
WITH changes AS (
  SELECT o_custkey, o_orderdate AS cd,
         MAX(CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER)) AS prio_digit
  FROM orders WHERE o_orderkey % 5 = 0
  GROUP BY 1, 2
),
pit AS (
  SELECT o.o_orderkey, c.prio_digit
  FROM orders o
  ASOF LEFT JOIN changes c
    ON o.o_custkey = c.o_custkey AND c.cd <= o.o_orderdate
)
SELECT prio_digit AS prio_at_order, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM pit GROUP BY 1
""",
        "nations_trade_pagerank": """
-- exact integer replay of the 3-iteration micro-unit PageRank
-- recurrence (truncating division on positive BIGINTs == Spark DIV);
-- dangling-node mass redistributed uniformly each iteration (the
-- damped teleport correction), same integer share formula both sides
WITH e AS (
  SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
params AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1000000 // (SELECT n FROM params) AS r FROM nodes),
d0 AS (SELECT COALESCE(SUM(r), 0) AS dang FROM r0
       WHERE node NOT IN (SELECT src FROM outdeg)),
r1 AS (
  SELECT nd.node,
         (1000000 - 850000) // (SELECT n FROM params)
           + COALESCE(c.s, 0)
           + ((SELECT dang FROM d0) * 850000)
             // (1000000 * (SELECT n FROM params)) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((r.r * 850000) // (1000000 * o.d)) AS BIGINT) AS s
    FROM e JOIN outdeg o ON e.src = o.src JOIN r0 r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
),
d1 AS (SELECT COALESCE(SUM(r), 0) AS dang FROM r1
       WHERE node NOT IN (SELECT src FROM outdeg)),
r2 AS (
  SELECT nd.node,
         (1000000 - 850000) // (SELECT n FROM params)
           + COALESCE(c.s, 0)
           + ((SELECT dang FROM d1) * 850000)
             // (1000000 * (SELECT n FROM params)) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((r.r * 850000) // (1000000 * o.d)) AS BIGINT) AS s
    FROM e JOIN outdeg o ON e.src = o.src JOIN r1 r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
),
d2 AS (SELECT COALESCE(SUM(r), 0) AS dang FROM r2
       WHERE node NOT IN (SELECT src FROM outdeg)),
r3 AS (
  SELECT nd.node,
         (1000000 - 850000) // (SELECT n FROM params)
           + COALESCE(c.s, 0)
           + ((SELECT dang FROM d2) * 850000)
             // (1000000 * (SELECT n FROM params)) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((r.r * 850000) // (1000000 * o.d)) AS BIGINT) AS s
    FROM e JOIN outdeg o ON e.src = o.src JOIN r2 r ON r.node = e.src
    GROUP BY e.dst) c ON nd.node = c.node
)
SELECT n_name, CAST(r AS BIGINT) AS rank_micro
FROM r3 JOIN nation ON node = n_nationkey
""",
        "documents_tfidf_terms": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
  FROM documents
),
pairs AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfs AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY 1),
idf AS (
  SELECT term,
         CAST(FLOOR(1000000.0 * LN(
           CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)
         )) AS BIGINT) AS idf_micro
  FROM dfs
),
scored AS (
  SELECT doc_id, p.term, tf, tf * idf_micro AS score_micro
  FROM pairs p JOIN idf USING (term)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, score_micro FROM ranked WHERE rnk <= 3
""",
        "documents_bm25": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
  FROM documents
),
lens AS (SELECT doc_id, COUNT(*) AS doc_len FROM toks GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(doc_len) AS BIGINT) AS tot FROM lens),
params AS (SELECT n, (1000000 * tot) // n AS avg_len_micro FROM stats),
pairs AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('spark', 'merge', 'filter') GROUP BY 1, 2
),
dfs AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY 1),
idf AS (
  SELECT term,
         CAST(FLOOR(1000000.0 * LN(
           CAST(2 * (SELECT n FROM params) + 2 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)
         )) AS BIGINT) AS idf_micro
  FROM dfs
),
scored AS (
  SELECT p.doc_id,
         (idf_micro * tf * (1200000 + 1000000)) // (
           tf * 1000000 + (1200000 * (
             (1000000 - 750000)
             + (750000 * l.doc_len * 1000000) // (SELECT avg_len_micro FROM params)
           )) // 1000000
         ) AS s
  FROM pairs p JOIN idf USING (term) JOIN lens l USING (doc_id)
)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC
LIMIT 10
""",
        "documents_cms_frequency": r"""
-- full replay of the 4x64 Count-Min sketch: counters, probe-row
-- bucket hashes, min-over-rows estimates — all deterministic given
-- the md5 row hashes, so values compare exactly; the CM theorem's
-- one-sided bound (est >= exact, ALWAYS) rides along as a boolean
WITH toks AS (
  SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
  FROM documents
),
probes AS (
  SELECT unnest(['spark', 'table', 'merge', 'the', 'filter', 'query', 'nosuchtoken']) AS term
),
rws AS (SELECT unnest([0, 1, 2, 3]) AS row),
counters AS (
  SELECT row,
         ('0x' || substr(md5(CAST(row AS VARCHAR) || ':' || term), 1, 8))::BIGINT % 64 AS bucket,
         COUNT(*) AS cnt
  FROM toks, rws GROUP BY 1, 2
),
probe_h AS (
  SELECT term, row,
         ('0x' || substr(md5(CAST(row AS VARCHAR) || ':' || term), 1, 8))::BIGINT % 64 AS bucket
  FROM probes, rws
),
est AS (
  SELECT term, MIN(COALESCE(cnt, 0)) AS est_n
  FROM probe_h LEFT JOIN counters USING (row, bucket) GROUP BY 1
),
exact AS (
  SELECT p.term, CAST(COALESCE(x.n, 0) AS BIGINT) AS exact_n
  FROM probes p LEFT JOIN (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1) x USING (term)
)
SELECT term, exact_n, est_n, est_n >= exact_n AS cm_upper_bound_ok
FROM est JOIN exact USING (term)
""",
        "events_ewma_daily": """
WITH daily AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
contrib AS (
  SELECT event_type, day + gap AS day2, CAST(1 << (7 - gap) AS BIGINT) * n AS w
  FROM daily, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS gap)
),
num AS (
  SELECT event_type, day2 AS day, CAST(SUM(w) AS BIGINT) AS num
  FROM contrib GROUP BY 1, 2
)
SELECT d.event_type, d.day, d.n, (1000000 * num) // 255 AS ewma_micro
FROM daily d JOIN num USING (event_type, day)
""",
        "events_anomaly_mad": """
WITH daily AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
meds AS (
  SELECT event_type, MEDIAN(CAST(n AS DOUBLE)) AS med FROM daily GROUP BY 1
),
mads AS (
  SELECT d.event_type, MEDIAN(ABS(CAST(n AS DOUBLE) - med)) AS mad
  FROM daily d JOIN meds USING (event_type) GROUP BY 1
)
SELECT day, daily.event_type, n, med, mad,
       ABS(CAST(n AS DOUBLE) - med) > 3 * mad AS is_anomaly
FROM daily JOIN meds USING (event_type) JOIN mads USING (event_type)
""",
        "orders_time_travel": """
-- expected content of each snapshot, recomputed from the source
-- table; versions_ok states the manifest-chain contract (commits
-- numbered 1..3) the driver verified via the os.link race check
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT * FROM (
  SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
         1 AS version, TRUE AS versions_ok
  FROM base WHERE o_orderkey % 3 <> 0 GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
         2 AS version, TRUE AS versions_ok
  FROM base GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
         3 AS version, TRUE AS versions_ok
  FROM base WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
)
""",
        "orders_snapshot_vacuum": """
-- expected content of the RETAINED (latest, overwrite-to-'F') version
-- re-read AFTER the vacuum; the lifecycle contract booleans
-- (dropped versions unreadable, disk == retained manifest exactly,
-- orphan collected) are driver-audited and stated TRUE
WITH base AS (
  SELECT o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents,
       TRUE AS old_versions_gone, TRUE AS disk_clean
FROM base GROUP BY o_orderstatus
""",
        "stream_cdc_apply": """
-- FULL value oracle: N-batch streaming last-write-wins WITH CDC
-- tombstones == the batch argmax per user over all events, winners
-- whose op is a delete (event_type = 'error') filtered from the live
-- view ((user, ts) unique => total winner)
SELECT user_id, event_type AS last_type, tns AS last_ts
FROM (
  SELECT user_id, event_type, EPOCH_NS(ts) AS tns,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY EPOCH_NS(ts) DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
""",
        "pipeline_prefix_filter_pairs": PO.prefix_filter_sql(600_000),
        "pipeline_dedup_keep_best": PO.keep_best_sql(0.5),
        "multimodal_ahash_dedup": """
-- closed-form replay of decode -> gray -> 8x8 thumbnail -> aHash:
-- sampled source pixel (2i, 2j, ch) of base-d is
-- (d + 14i + 26j + 29ch [+1 on the perturbed copies where
-- (2i+2j)%7=0]) mod 256; bit = gray > floor(mean); two 32-bit halves
WITH imgs AS (
  SELECT CAST(d AS BIGINT) AS doc_id, CAST(d AS BIGINT) AS base, 0 AS pert
  FROM range(0, 48) t(d)
  UNION ALL
  SELECT CAST(d + 1000 AS BIGINT), CAST(d AS BIGINT), 0
  FROM range(0, 48) t(d) WHERE d % 6 = 0
  UNION ALL
  SELECT CAST(d + 2000 AS BIGINT), CAST(d AS BIGINT), 1
  FROM range(0, 48) t(d) WHERE d % 6 = 3
),
px AS (
  SELECT doc_id, a.i * 8 + b.j AS idx,
         ((base + 14*a.i + 26*b.j
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
          + (base + 14*a.i + 26*b.j + 29
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
          + (base + 14*a.i + 26*b.j + 58
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
         ) // 3 AS gray
  FROM imgs, range(0, 8) a(i), range(0, 8) b(j)
),
means AS (SELECT doc_id, SUM(gray) // 64 AS m FROM px GROUP BY doc_id),
hashes AS (
  SELECT p.doc_id,
         CAST(SUM(CASE WHEN idx < 32 AND gray > m
                       THEN CAST(1 AS BIGINT) << idx ELSE 0 END) AS BIGINT) AS hash_lo,
         CAST(SUM(CASE WHEN idx >= 32 AND gray > m
                       THEN CAST(1 AS BIGINT) << (idx - 32) ELSE 0 END) AS BIGINT) AS hash_hi
  FROM px p JOIN means USING (doc_id)
  GROUP BY p.doc_id
)
SELECT doc_id, hash_lo, hash_hi,
       COUNT(*) OVER (PARTITION BY hash_lo, hash_hi) AS group_size
FROM hashes
""",
        "multimodal_ahash_pairs": """
-- BRUTE-FORCE all-pairs popcount over the closed-form aHash replay:
-- the banded pigeonhole join must equal this exactly (100% recall at
-- the radius is a theorem, and the popcount verify gives exact
-- precision) — the differential statement of the banding's exactness
WITH imgs AS (
  SELECT CAST(d AS BIGINT) AS doc_id, CAST(d AS BIGINT) AS base, 0 AS pert
  FROM range(0, 48) t(d)
  UNION ALL
  SELECT CAST(d + 1000 AS BIGINT), CAST(d AS BIGINT), 0
  FROM range(0, 48) t(d) WHERE d % 6 = 0
  UNION ALL
  SELECT CAST(d + 2000 AS BIGINT), CAST(d AS BIGINT), 1
  FROM range(0, 48) t(d) WHERE d % 6 = 3
),
px AS (
  SELECT doc_id, a.i * 8 + b.j AS idx,
         ((base + 14*a.i + 26*b.j
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
          + (base + 14*a.i + 26*b.j + 29
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
          + (base + 14*a.i + 26*b.j + 58
             + CASE WHEN pert = 1 AND (2*a.i + 2*b.j) % 7 = 0 THEN 1 ELSE 0 END) % 256
         ) // 3 AS gray
  FROM imgs, range(0, 8) a(i), range(0, 8) b(j)
),
means AS (SELECT doc_id, SUM(gray) // 64 AS m FROM px GROUP BY doc_id),
hashes AS (
  SELECT p.doc_id,
         CAST(SUM(CASE WHEN idx < 32 AND gray > m
                       THEN CAST(1 AS BIGINT) << idx ELSE 0 END) AS BIGINT) AS hash_lo,
         CAST(SUM(CASE WHEN idx >= 32 AND gray > m
                       THEN CAST(1 AS BIGINT) << (idx - 32) ELSE 0 END) AS BIGINT) AS hash_hi
  FROM px p JOIN means USING (doc_id)
  GROUP BY p.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.hash_lo, b.hash_lo))
            + bit_count(xor(a.hash_hi, b.hash_hi)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hash_lo, b.hash_lo))
      + bit_count(xor(a.hash_hi, b.hash_hi)) <= 3
""",
        "ann_filtered_top3": PO.ann_ivf_filtered_sql(3, 8, 2, 5),
        "stream_snapshot_ingest": """
-- FULL value oracle: N tagged batch commits of exactly-once streaming
-- ingestion == the batch hourly rollup of every event (a replayed or
-- lost batch would shift these counts)
SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour, event_type,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
        "stream_anomaly_mad": """
-- FULL value oracle: the 4-batch maintained daily rollup + MAD flags
-- equal the batch recompute exactly (integer counts; interpolated
-- medians of ints are exact binary halves/quarters)
WITH daily AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
meds AS (
  SELECT event_type, MEDIAN(CAST(n AS DOUBLE)) AS med FROM daily GROUP BY 1
),
mads AS (
  SELECT d.event_type, MEDIAN(ABS(CAST(n AS DOUBLE) - med)) AS mad
  FROM daily d JOIN meds USING (event_type) GROUP BY 1
)
SELECT day, daily.event_type, n, med, mad,
       ABS(CAST(n AS DOUBLE) - med) > 3 * mad AS is_anomaly
FROM daily JOIN meds USING (event_type) JOIN mads USING (event_type)
""",
        "events_trend_slope": """
WITH daily AS (
  SELECT EPOCH_NS(ts) // 86400000000000 AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
sums AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         CAST(SUM(day) AS BIGINT) AS sx,
         CAST(SUM(n) AS BIGINT) AS sy,
         CAST(SUM(day * n) AS BIGINT) AS sxy,
         CAST(SUM(day * day) AS BIGINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
       (1000000 * (n_days * sxy - sx * sy)) // (n_days * sxx - sx * sx)
         AS slope_micro
FROM sums
""",
        "orders_bucketed_join": """
-- bucketing must never change answers: the oracle is the PLAIN join
-- aggregate; colocated_ok states the zero-Exchange plan property the
-- driver verified on the executed bucketed join
SELECT c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_cents,
       TRUE AS colocated_ok
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
        "orders_schema_evolution": """
SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus
            ELSE '<pre-evolution>' END AS status_group,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders GROUP BY 1
""",
        "events_session_window": """
-- session_window boundary semantics (pytest-pinned): an event at
-- EXACTLY gap distance still MERGES (start <= previous end is
-- inclusive), so only a STRICTLY greater gap splits; end = last + gap
WITH ev AS (SELECT user_id, EPOCH_NS(ts) AS tns, value FROM events),
flagged AS (
  SELECT user_id, tns, value,
         CASE WHEN LAG(tns) OVER w IS NULL
                   OR tns - LAG(tns) OVER w > 1800000000000
              THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns)
),
sess AS (
  SELECT user_id, tns, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(tns) AS session_start,
       MAX(tns) + 1800000000000 AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS total_value
FROM sess GROUP BY user_id, sid
""",
        "events_unpivot": """
WITH hours AS (
  SELECT DISTINCT EPOCH_NS(ts) // 3600000000000 AS epoch_hour FROM events
),
types AS (
  SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type
),
counts AS (
  SELECT EPOCH_NS(ts) // 3600000000000 AS epoch_hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT h.epoch_hour, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM hours h CROSS JOIN types t
LEFT JOIN counts c ON c.epoch_hour = h.epoch_hour AND c.event_type = t.event_type
""",
        "orders_profile": """
SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS null_count,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
""",
        "lineitem_constraints": """
-- the rule EXPRESSIONS are the cross-engine contract: identical text
-- runs on both engines; violations count false OR NULL
SELECT 'qty_in_range' AS rule, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN (l_quantity BETWEEN 1 AND 50) THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
       SUM(CASE WHEN (l_quantity BETWEEN 1 AND 50) THEN 0 ELSE 1 END) = 0 AS ok
FROM lineitem
UNION ALL
SELECT 'qty_small', COUNT(*),
       CAST(SUM(CASE WHEN (l_quantity <= 30) THEN 0 ELSE 1 END) AS BIGINT),
       SUM(CASE WHEN (l_quantity <= 30) THEN 0 ELSE 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'discount_in_range', COUNT(*),
       CAST(SUM(CASE WHEN (l_discount BETWEEN 0.0 AND 0.1) THEN 0 ELSE 1 END) AS BIGINT),
       SUM(CASE WHEN (l_discount BETWEEN 0.0 AND 0.1) THEN 0 ELSE 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'shipdate_present', COUNT(*),
       CAST(SUM(CASE WHEN (l_shipdate IS NOT NULL) THEN 0 ELSE 1 END) AS BIGINT),
       SUM(CASE WHEN (l_shipdate IS NOT NULL) THEN 0 ELSE 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'returnflag_domain', COUNT(*),
       CAST(SUM(CASE WHEN (l_returnflag IN ('A', 'N', 'R')) THEN 0 ELSE 1 END) AS BIGINT),
       SUM(CASE WHEN (l_returnflag IN ('A', 'N', 'R')) THEN 0 ELSE 1 END) = 0
FROM lineitem
""",
        "documents_inverted_index": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
  FROM documents
),
pairs AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT doc_id, term, tf,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id) FILTER (rn <= 5)), ',') AS postings_sample
FROM ranked GROUP BY term
""",
        "lineitem_quantity_histogram": """
WITH hist AS (
  SELECT l_returnflag,
         LEAST(GREATEST(CAST(l_quantity - 1 AS BIGINT) // 5, 0), 9) AS bin,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bin, n,
         SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS c,
         SUM(n) OVER (PARTITION BY l_returnflag) AS tot
  FROM hist
),
med AS (
  SELECT l_returnflag, MIN(bin) AS median_bin
  FROM cum WHERE c * 1000000 >= 500000 * tot GROUP BY 1
)
SELECT h.l_returnflag, h.bin, h.n, m.median_bin,
       1 + m.median_bin * 5 AS est_median_qty
FROM hist h JOIN med m USING (l_returnflag)
""",
    }
