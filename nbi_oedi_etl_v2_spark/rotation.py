"""Driver-slot rotation policy (round 9).

The verification driver records at most ``DRIVER_QUERY_CAP`` (50)
correctness rows per round, while the registry holds 209 specs
(203 + the wave-28 rank statistics and wave-29 experimentation
family added this round).
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

ROUND-9 STATE (executes the round-8 note verbatim): a registry of R
specs refreshed at most cap=50 rows/round cannot guarantee a
staleness bound below ceil(R/cap); with R=209 that floor is 5, so
``STALENESS_BOUND_ROUNDS = 5``. CORRECTNESS_r08 was 50/50 green and
is merged below (31 first rows among them -> every one of the 203
r8-era specs has a green driver row). The r9 export is the forced
set the round-8 note predicted: the 17 r3 stragglers reach age 6
(> bound 5) and are taken by the oldest-first fill BY CONSTRUCTION
(they sort first), + PIN + TOUCH (the graph broadcast-lever trio,
gini, both bootstrap forms, streaming CUSUM - the r9 code changes)
+ the 6 never-verified wave-28/29 specs (KS drift,
Kruskal-Wallis, CUPED, two-proportion z, Welch t, chi-square
independence), leaving the rest of the
fill for the r4 cohort (10 specs at age 5) and the 7 oldest r5
names. ``DEFER_FIRST_ROW`` is EMPTY.

ROUND-10 NOTE (computed at the end of round 9, don't rediscover it):
merge CORRECTNESS_r09 greens first (expected: PIN + TOUCH(7) + 6
wave-28/29 first rows + all 17 r3 + all 10 r4 + 7 oldest r5 names ->
every r3/r4 entry moves to 9). The r10 forced set is then just PIN +
new TOUCH; the fill takes the ~29 remaining r5-cohort specs (age 5
at r10) first - they MUST all export at r10 or the bound breaks -
then the r6 cohort oldest-first. Bound 5 stays feasible while
R <= 250.
"""

from __future__ import annotations

CURRENT_ROUND = 9
STALENESS_BOUND_ROUNDS = 5

# Latest round with a green driver row, from CORRECTNESS_r{1..7}.json.
VERIFIED_ROUNDS: dict[str, int] = {
    "approx_distinct_users": 5,
    "asof_last_order_per_event": 4,
    "corpus_balanced_shards": 6,
    "corpus_budget_select": 8,
    "corpus_contamination": 5,
    "corpus_curate": 6,
    "corpus_dsir_weights": 8,
    "corpus_global_shuffle": 6,
    "corpus_hash_split": 6,
    "corpus_incremental_dedup": 8,
    "corpus_length_histogram": 8,
    "corpus_mixture_sample": 6,
    "corpus_near_dedup": 7,
    "corpus_pack_chunks": 7,
    "corpus_pack_ffd": 5,
    "corpus_pack_next_fit": 7,
    "corpus_quality_sample": 8,
    "corpus_source_stats": 8,
    "corpus_stratified_sample": 7,
    "corpus_weighted_reservoir": 4,
    "custkeys_1995_and_1996": 6,
    "custkeys_1995_not_1996": 6,
    "customer_bloom_inactive": 6,
    "customer_entity_resolution": 6,
    "customer_fuzzy_name_pairs": 5,
    "customers_per_segment": 8,
    "customers_with_open_orders": 7,
    "customers_without_orders": 6,
    "dedup_components": 7,
    "dedup_duplicate_spans": 8,
    "dedup_embedding_cosine": 7,
    "dedup_exact": 7,
    "dedup_minhash_lsh": 5,
    "dedup_ngram_jaccard": 7,
    "dedup_simhash": 5,
    "distinct_flags": 7,
    "documents_bpe_merges": 6,
    "documents_bpe_token_counts": 6,
    "documents_hashed_features": 8,
    "documents_nb_token_logodds": 8,
    "documents_sliding_chunks": 8,
    "dq_profile_orders": 5,
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
    "events_anomaly_zscore": 4,
    "events_audience_overlap": 5,
    "events_cm_frequency_rollup": 6,
    "events_cohort_retention": 4,
    "events_cusum_changepoints": 8,
    "events_funnel": 4,
    "events_heavy_hitters": 6,
    "events_hll_daily_rollup": 5,
    "events_hourly_anomalies": 7,
    "events_in_prior_hour": 7,
    "events_interval_attribution": 4,
    "events_json_props_rollup": 8,
    "events_json_roundtrip": 5,
    "events_kaplan_meier_churn": 8,
    "events_markov_attribution": 8,
    "events_markov_transitions": 8,
    "events_ndcg_backtest": 8,
    "events_orc_roundtrip": 4,
    "events_pattern_users": 6,
    "events_pit_priority_lookup": 6,
    "events_quantile_sketch_rollup": 5,
    "events_seasonal_naive_backtest": 8,
    "events_seasonal_profile": 6,
    "ewma_alerts_batch": 6,
    "lineitem_association_rules": 7,
    "lineitem_benford_audit": 8,
    "lineitem_bootstrap_mean_ci": 8,
    "lineitem_bootstrap_mean_ci_blb": 8,
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
    "multimodal_decode": 4,
    "multimodal_decode_jpeg": 5,
    "multimodal_decode_png": 4,
    "multimodal_decode_wav": 4,
    "multimodal_image_near_dups": 5,
    "multimodal_jpeg_headers": 6,
    "multimodal_mp4_headers": 5,
    "multimodal_png_headers": 6,
    "multimodal_wav_headers": 6,
    "nation_customer_rollup": 7,
    "orders_aqp_revenue_estimate": 6,
    "orders_cdc_merge": 5,
    "orders_cube": 8,
    "orders_dp_noised_counts": 7,
    "orders_dq_constraints": 5,
    "orders_fd_violations": 7,
    "orders_gini_by_priority": 8,
    "orders_grouping_sets": 7,
    "orders_ivm_join_delta": 5,
    "orders_k_anonymity_audit": 6,
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
    "part_copurchase_kcore": 8,
    "part_copurchase_labelprop": 7,
    "part_copurchase_pagerank": 5,
    "part_copurchase_sssp": 7,
    "part_copurchase_triangles": 5,
    "part_item_similarity": 6,
    "price_percentiles_by_priority": 7,
    "q10_returned_items": 8,
    "q11_important_parts": 8,
    "q12_priority_lines": 8,
    "q13_customer_distribution": 8,
    "q14_promo_revenue": 8,
    "q15_top_supplier": 3,
    "q16_parts_supplier_counts": 3,
    "q17_small_quantity_revenue": 3,
    "q18_large_volume_customers": 5,
    "q19_discounted_revenue": 3,
    "q1_pricing_summary": 7,
    "q20_excess_share_suppliers": 3,
    "q21_waiting_suppliers": 3,
    "q22_global_sales_opportunity": 3,
    "q2_min_cost_supplier": 3,
    "q3_shipping_priority": 7,
    "q4_order_priority": 3,
    "q5_local_supplier_volume": 7,
    "q6_forecast_revenue": 3,
    "q7_volume_shipping": 3,
    "q8_market_share": 3,
    "q9_product_profit": 3,
    "segment_active_customers": 8,
    "sessionize_events": 7,
    "similarity_topk": 5,
    "similarity_topk_ivf": 7,
    "similarity_topk_ivfpq": 5,
    "similarity_topk_lsh": 5,
    "similarity_topk_pq": 5,
    "streaming_attribution_join": 7,
    "streaming_cm_sketch": 6,
    "streaming_cusum_alerts": 8,
    "streaming_dedup_events": 7,
    "streaming_dim_enrich": 3,
    "streaming_ewma_alerts": 7,
    "streaming_hourly_downsample": 5,
    "streaming_sessionize": 7,
    "text_bm25_topk": 5,
    "text_compressibility": 5,
    "text_fingerprint": 7,
    "text_hybrid_rrf_topk": 7,
    "text_inverted_index": 6,
    "text_language_id": 7,
    "text_lm_scores": 3,
    "text_pii_redaction": 3,
    "text_quality_scores": 7,
    "text_repetition_scores": 3,
    "text_token_pmi": 6,
    "text_token_stats": 7,
    "text_vocabulary": 5,
    "top10_orders_by_price": 6,
    "topk_per_segment": 8,
    "user_running_value": 7,
}

# PIN - the reference saved-query parity trio
# (reference sql/saved-queries.sql:10-45); never rotates out.
PIN: frozenset[str] = frozenset({
    "segment_active_customers",
    "customers_per_segment",
    "topk_per_segment",
})

# TOUCH - specs whose operator code changed this round (round 9):
# VERDICT r8 items 1/4/5 + ADVICE r8. Graph memory-aware broadcast
# levers + the new SSSP dist-join lever (operators/graph.py) ->
# part_copurchase_kcore / part_copurchase_sssp /
# part_copurchase_labelprop; gini lazy two-consumer rework (no
# persist, in-plan chunk-total guard, projection-surviving negative
# guard; stats.py) -> orders_gini_by_priority; the one-hash
# Box-Muller BLB weight draw + narrow-input widening for BOTH
# bootstrap explodes (stats.py) -> lineitem_bootstrap_mean_ci_blb,
# lineitem_bootstrap_mean_ci; CUSUM output-schema quoting/collision
# guard (streaming/) -> streaming_cusum_alerts.
TOUCH: frozenset[str] = frozenset({
    "part_copurchase_kcore",
    "part_copurchase_sssp",
    "part_copurchase_labelprop",
    "orders_gini_by_priority",
    "lineitem_bootstrap_mean_ci_blb",
    "lineitem_bootstrap_mean_ci",
    "streaming_cusum_alerts",
})

# ADVISED - explicit re-verification asks from VERDICT r8: none (the
# verdict's items resolve to TOUCH + the forced age-6 fill).
ADVISED: frozenset[str] = frozenset()

# DEFER_FIRST_ROW - EMPTY: every spec has a green driver row, so
# there are no first rows to defer.
DEFER_FIRST_ROW: frozenset[str] = frozenset()


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
