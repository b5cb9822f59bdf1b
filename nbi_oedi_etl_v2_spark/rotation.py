"""Driver-slot rotation policy (round 10).

The verification driver records at most ``DRIVER_QUERY_CAP`` (50)
correctness rows per round, while the registry holds 215 specs
(209 + the wave-30 rank statistics: Mann-Whitney U and sort-free
Spearman, + the wave-31 inference completion: one-way ANOVA F,
Brown-Forsythe, log-rank, BH-FDR — all four DEFERRED to r11 for
their first rows; both waves added in round 10).
Rounds 1-5 hand-picked each round's export; VERDICT r5 ("What's
wrong" #2) demanded the rotation guarantee a STALENESS BOUND -
every spec re-earns a driver row within K rounds, or old green rows
decay into "verified once, long ago".

This module encodes the bound STRUCTURALLY instead of by hand:

* ``VERIFIED_ROUNDS`` - for every spec, the latest round in which the
  driver recorded a green (rows+schema+hash) CORRECTNESS row for it.
  Updated once per round from CORRECTNESS_r{N}.json (the builder's
  first task each round); specs absent here have never been
  driver-verified.
* ``build_driver_export(registry)`` - computes the export as
  PIN (parity trio, permanent)
  + never-verified specs (every new operator gets its first row ASAP)
  + TOUCH (operator code changed this round - semantics must re-prove)
  + ADVISED (explicit re-verification requests from VERDICT/ADVICE)
  + oldest-first fill to the cap (ties broken by name, so the export
    is deterministic and reproducible from this file alone).

ROUND-10 STATE (executes the round-9 note verbatim): a registry of R
specs refreshed at most cap=50 rows/round cannot guarantee a
staleness bound below ceil(R/cap); with R=209 that floor is 5, so
``STALENESS_BOUND_ROUNDS = 5``. CORRECTNESS_r09 was 50/50 green
(rows+schema+hash, zero err) and is merged below - every key in that
file, including the 6 wave-28/29 first rows, now reads 9. The r10
export is exactly what the round-9 note predicted: PIN + the new
TOUCH (this round's code changes: the two-level-prefix full-outer
boundary guard and its three consumers, the NULL-flag semantics fix
in the two-sample tests, the graph mem-parse strictness, and the
explode-funnel widenings) + the 2 never-verified wave-30 specs +
the 29-spec r5 cohort at age 5 - they MUST all export this round or
the bound breaks for the first time - with the remaining 5 slots
from the r6 cohort oldest-first. ``DEFER_FIRST_ROW`` is EMPTY.

ROUND-11 NOTE (computed at the end of round 10, don't rediscover
it): merge CORRECTNESS_r10 greens first (expected: PIN + TOUCH(12) +
2 wave-30 first rows + all 29 r5-cohort + 5 oldest r6 names ->
the oldest cohort becomes r6 with 38 specs at age 5 at r11). The
r11 forced set is PIN + new TOUCH + those 38 + the 4 deferred
wave-31 first rows (see DEFER_FIRST_ROW below) - meaning at most
5 r11 TOUCH slots remain; keep the r11 diff tight or defer fill,
never the forced age-5 set. Bound 5 stays feasible while R <= 250
(R = 215 after wave 31); the prospective capacity assert in
tests/test_workload_oracle.py fails the round a spec lands past
that ceiling.
"""

from __future__ import annotations

CURRENT_ROUND = 10
STALENESS_BOUND_ROUNDS = 5

# Latest round with a green driver row, from CORRECTNESS_r{1..7}.json.
VERIFIED_ROUNDS: dict[str, int] = {
    "approx_distinct_users": 9,
    "asof_last_order_per_event": 9,
    "corpus_balanced_shards": 6,
    "corpus_budget_select": 8,
    "corpus_contamination": 9,
    "corpus_curate": 6,
    "corpus_dsir_weights": 8,
    "corpus_global_shuffle": 6,
    "corpus_hash_split": 6,
    "corpus_incremental_dedup": 8,
    "corpus_length_histogram": 8,
    "corpus_mixture_sample": 6,
    "corpus_near_dedup": 7,
    "corpus_pack_chunks": 7,
    "corpus_pack_ffd": 9,
    "corpus_pack_next_fit": 7,
    "corpus_quality_sample": 8,
    "corpus_source_stats": 8,
    "corpus_stratified_sample": 7,
    "corpus_weighted_reservoir": 9,
    "custkeys_1995_and_1996": 6,
    "custkeys_1995_not_1996": 6,
    "customer_bloom_inactive": 6,
    "customer_entity_resolution": 6,
    "customer_fuzzy_name_pairs": 9,
    "customers_per_segment": 9,
    "customers_with_open_orders": 7,
    "customers_without_orders": 6,
    "dedup_components": 7,
    "dedup_duplicate_spans": 8,
    "dedup_embedding_cosine": 7,
    "dedup_exact": 7,
    "dedup_minhash_lsh": 9,
    "dedup_ngram_jaccard": 7,
    "dedup_simhash": 9,
    "distinct_flags": 7,
    "documents_bpe_merges": 6,
    "documents_bpe_token_counts": 6,
    "documents_hashed_features": 8,
    "documents_nb_token_logodds": 8,
    "documents_sliding_chunks": 8,
    "dq_profile_orders": 9,
    "embedding_normalize": 7,
    "embedding_quantize": 8,
    "embedding_semantic_dedup": 5,
    "embeddings_kmeans_lloyd": 7,
    "embeddings_random_projection": 8,
    "embeddings_triplet_mining": 8,
    "etl_gapfill_hours": 8,
    "etl_gapfill_interp": 6,
    "etl_hourly_downsample": 5,
    "etl_incremental_agg_merge": 6,
    "etl_write_pipeline": 7,
    "events_ab_proportion_test": 9,
    "events_anomaly_zscore": 9,
    "events_audience_overlap": 5,
    "events_cm_frequency_rollup": 6,
    "events_cohort_retention": 9,
    "events_cuped_adjustment": 9,
    "events_cusum_changepoints": 8,
    "events_funnel": 9,
    "events_heavy_hitters": 6,
    "events_hll_daily_rollup": 5,
    "events_hourly_anomalies": 7,
    "events_in_prior_hour": 7,
    "events_interval_attribution": 9,
    "events_json_props_rollup": 8,
    "events_json_roundtrip": 5,
    "events_kaplan_meier_churn": 8,
    "events_markov_attribution": 8,
    "events_markov_transitions": 8,
    "events_ndcg_backtest": 8,
    "events_orc_roundtrip": 9,
    "events_pattern_users": 6,
    "events_pit_priority_lookup": 6,
    "events_quantile_sketch_rollup": 5,
    "events_seasonal_naive_backtest": 8,
    "events_seasonal_profile": 6,
    "events_welch_value_ttest": 9,
    "ewma_alerts_batch": 6,
    "lineitem_association_rules": 7,
    "lineitem_benford_audit": 8,
    "lineitem_bootstrap_mean_ci": 9,
    "lineitem_bootstrap_mean_ci_blb": 9,
    "lineitem_conformal_interval": 8,
    "lineitem_correlation_matrix": 6,
    "lineitem_double_price_quantiles": 6,
    "lineitem_equidepth_deciles": 7,
    "lineitem_equidepth_double": 7,
    "lineitem_exact_price_quantiles": 6,
    "lineitem_logreg_auc": 8,
    "lineitem_logreg_calibration": 8,
    "lineitem_logreg_cv_auc": 8,
    "lineitem_logreg_pr_curve": 8,
    "lineitem_logreg_return_model": 7,
    "lineitem_mad_outliers": 8,
    "lineitem_ols2_price_model": 6,
    "lineitem_ols_price_model": 6,
    "lineitem_pca_top_component": 8,
    "lineitem_percentile_ranks": 7,
    "lineitem_price_trend": 6,
    "lineitem_stump_splits": 7,
    "lineitem_weighted_price_quantiles": 6,
    "lineitem_winsorized_prices": 7,
    "monthly_active_customers": 6,
    "multimodal_audio_decimate": 5,
    "multimodal_decode": 9,
    "multimodal_decode_jpeg": 5,
    "multimodal_decode_png": 9,
    "multimodal_decode_wav": 9,
    "multimodal_image_near_dups": 5,
    "multimodal_jpeg_headers": 6,
    "multimodal_mp4_headers": 5,
    "multimodal_png_headers": 6,
    "multimodal_wav_headers": 6,
    "nation_customer_rollup": 7,
    "orders_aqp_revenue_estimate": 6,
    "orders_cdc_merge": 5,
    "orders_chi2_priority_status": 9,
    "orders_cube": 8,
    "orders_dp_noised_counts": 7,
    "orders_dq_constraints": 5,
    "orders_fd_violations": 7,
    "orders_gini_by_priority": 9,
    "orders_grouping_sets": 7,
    "orders_ivm_join_delta": 5,
    "orders_k_anonymity_audit": 6,
    "orders_kruskal_priority": 9,
    "orders_ks_price_drift": 9,
    "orders_lineitem_join_size_agms": 7,
    "orders_mi_feature_cells": 8,
    "orders_moving_range_avg": 5,
    "orders_neyman_sample": 8,
    "orders_pivot_status": 7,
    "orders_psi_price_drift": 7,
    "orders_rollup": 6,
    "orders_scd2_priority": 5,
    "orders_schema_evolution_union": 6,
    "orders_skipping_bloom_scan": 6,
    "orders_skipping_scan": 6,
    "orders_skyline": 5,
    "orders_snapshot_diff": 5,
    "orders_table_fingerprint": 8,
    "orders_table_profile": 8,
    "orders_target_encode_priority": 8,
    "orders_window_suite": 6,
    "orders_woe_iv_priority": 8,
    "orders_zorder_key": 8,
    "part_copurchase_bfs": 5,
    "part_copurchase_kcore": 9,
    "part_copurchase_labelprop": 9,
    "part_copurchase_pagerank": 5,
    "part_copurchase_sssp": 9,
    "part_copurchase_triangles": 5,
    "part_item_similarity": 6,
    "price_percentiles_by_priority": 7,
    "q10_returned_items": 8,
    "q11_important_parts": 8,
    "q12_priority_lines": 8,
    "q13_customer_distribution": 8,
    "q14_promo_revenue": 8,
    "q15_top_supplier": 9,
    "q16_parts_supplier_counts": 9,
    "q17_small_quantity_revenue": 9,
    "q18_large_volume_customers": 5,
    "q19_discounted_revenue": 9,
    "q1_pricing_summary": 7,
    "q20_excess_share_suppliers": 9,
    "q21_waiting_suppliers": 9,
    "q22_global_sales_opportunity": 9,
    "q2_min_cost_supplier": 9,
    "q3_shipping_priority": 7,
    "q4_order_priority": 9,
    "q5_local_supplier_volume": 7,
    "q6_forecast_revenue": 9,
    "q7_volume_shipping": 9,
    "q8_market_share": 9,
    "q9_product_profit": 9,
    "segment_active_customers": 9,
    "sessionize_events": 7,
    "similarity_topk": 5,
    "similarity_topk_ivf": 7,
    "similarity_topk_ivfpq": 5,
    "similarity_topk_lsh": 5,
    "similarity_topk_pq": 5,
    "streaming_attribution_join": 7,
    "streaming_cm_sketch": 6,
    "streaming_cusum_alerts": 9,
    "streaming_dedup_events": 7,
    "streaming_dim_enrich": 9,
    "streaming_ewma_alerts": 7,
    "streaming_hourly_downsample": 5,
    "streaming_sessionize": 7,
    "text_bm25_topk": 5,
    "text_compressibility": 5,
    "text_fingerprint": 7,
    "text_hybrid_rrf_topk": 7,
    "text_inverted_index": 6,
    "text_language_id": 7,
    "text_lm_scores": 9,
    "text_pii_redaction": 9,
    "text_quality_scores": 7,
    "text_repetition_scores": 9,
    "text_token_pmi": 6,
    "text_token_stats": 7,
    "text_vocabulary": 5,
    "top10_orders_by_price": 6,
    "topk_per_segment": 9,
    "user_running_value": 7,
}

# PIN - the reference saved-query parity trio
# (reference sql/saved-queries.sql:10-45); never rotates out.
PIN: frozenset[str] = frozenset({
    "segment_active_customers",
    "customers_per_segment",
    "topk_per_segment",
})

# TOUCH - specs whose operator code changed this round (round 10):
# ADVICE r9 medium (two_level_prefix boundary guard -> full-outer
# join; stats.py) touches its three consumers ->
# orders_gini_by_priority / orders_ks_price_drift /
# orders_kruskal_priority; VERDICT r9 wrong #1 (NULL-flag coalesce
# + null_flags output in the two-sample tests) ->
# orders_ks_price_drift (again), events_ab_proportion_test,
# events_welch_value_ttest; ADVICE r9 low (ks totals derived from
# the distinct table, not a second scan) -> orders_ks_price_drift;
# ADVICE r9 low (_parse_mem_bytes rejects unknown unit suffixes;
# operators/graph.py) -> part_copurchase_kcore /
# part_copurchase_sssp / part_copurchase_labelprop; the
# explode-funnel widening sweep (VERDICT r9 missing #1, with the
# cheap plan-stats partition probe per wrong #2 — operators/
# _scale.py) -> both bootstrap forms (probe swap under the existing
# widen), documents_hashed_features (1.14 -> 1.00 s), and the JPEG
# decode spec (the sweep's one big win: 1.71 -> 0.70 s at sf0.1 by
# widening the id rows BEFORE payload synthesis — the payload column
# itself never shuffles, per the plan pin). Audited and left
# UNWIDENED with measurements: DSIR tokenize (flat 1.59 -> 1.63),
# png/wav/raw decode (regressed — exchange overhead beats the cheap
# decode), dedup shingle sites (minhash REGRESSED 1.61 -> 2.31,
# ngram marginal 2.42 -> 2.10: the shingle fan-outs feed
# aggregation exchanges that already rebalance).
TOUCH: frozenset[str] = frozenset({
    "orders_gini_by_priority",
    "orders_ks_price_drift",
    "orders_kruskal_priority",
    "events_ab_proportion_test",
    "events_welch_value_ttest",
    "part_copurchase_kcore",
    "part_copurchase_sssp",
    "part_copurchase_labelprop",
    "lineitem_bootstrap_mean_ci",
    "lineitem_bootstrap_mean_ci_blb",
    "documents_hashed_features",
    "multimodal_decode_jpeg",
})

# ADVISED - explicit re-verification asks from VERDICT r9: none (the
# verdict's items all resolve to TOUCH or to the forced age-5 fill).
ADVISED: frozenset[str] = frozenset()

# DEFER_FIRST_ROW - the wave-31 inference specs (landed late in
# round 10, after the r10 export was already fixed by the round-9
# note's arithmetic): their first driver rows come at r11, inside
# the 9-slot budget the ROUND-11 NOTE reserves beyond PIN + the
# 38-spec forced age-5 cohort (4 first rows -> at most 5 r11 TOUCH
# slots remain; keep the r11 diff tight).
DEFER_FIRST_ROW: frozenset[str] = frozenset({
    "orders_anova_priority",
    "orders_levene_priority",
    "events_logrank_arms",
    "orders_bh_fdr_customers",
})


def build_driver_export(registry: set[str], cap: int) -> frozenset[str]:
    """Deterministic round-``CURRENT_ROUND`` export: forced slots
    (PIN + never-verified + TOUCH + ADVISED), then oldest-first fill
    by (last-verified round, name)."""
    forced = (PIN | TOUCH | ADVISED) & registry
    never = {
        s for s in registry if s not in VERIFIED_ROUNDS
    } - DEFER_FIRST_ROW
    export = set(forced | never)
    assert len(export) <= cap, (
        f"{len(export)} forced slots exceed the {cap}-row cap; "
        "trim TOUCH/ADVISED"
    )
    fill = sorted(
        (s for s in registry if s not in export and s not in DEFER_FIRST_ROW),
        key=lambda s: (VERIFIED_ROUNDS[s], s),
    )
    export.update(fill[: cap - len(export)])
    return frozenset(export)
