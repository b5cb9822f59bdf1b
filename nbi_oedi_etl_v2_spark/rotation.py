"""Driver-slot rotation policy (round 11).

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

ROUND-11 STATE (executes the round-10 note verbatim):
CORRECTNESS_r10 was 50/50 green and is merged below (every key in
that file reads 10, including the two wave-30 first rows). The r11
export is PIN(3) + TOUCH(8: the round-10 backlog the r10 verdict
flagged plus this round's labelprop/minhash changes; 3 of the 8 sit
inside the age-5 cohort) + the 4 wave-31 first rows (never-verified;
DEFER_FIRST_ROW is now EMPTY) + the 38-spec r6 cohort at age 5 -
they MUST all export this round or the bound breaks for the first
time. That sums to EXACTLY the 50-row cap, with zero slack: one
change this round (the simhash expression batching, measured, and
the -0.0 literal emitter in _pq_cent_literal) was deliberately
deferred/resolved-by-documentation because its spec's TOUCH row
would not fit - see the TOUCH comment below.

ROUND-12 NOTE (computed at the end of round 11, don't rediscover
it): merge CORRECTNESS_r11 greens first; the oldest cohort then
becomes the 37-spec r7 set at age 5 (41 specs read 8 at r11 -> wait
for the merge, the exact cohort is whatever reads 7 after it). PIN +
that cohort leaves ~9 slots for new TOUCH + fill. The deferred
simhash batching (operators/dedup.py in-code note) is pre-measured
and should take one of them if any code round happens. Bound 5
stays feasible while R <= 250 (R = 215); the prospective capacity
assert in tests/test_workload_oracle.py fails the round a spec
lands past that ceiling.
"""

from __future__ import annotations

CURRENT_ROUND = 11
STALENESS_BOUND_ROUNDS = 5

# Latest round with a green driver row, from CORRECTNESS_r{1..7}.json.
VERIFIED_ROUNDS: dict[str, int] = {
    "approx_distinct_users": 9,
    "asof_last_order_per_event": 9,
    "corpus_balanced_shards": 10,
    "corpus_budget_select": 8,
    "corpus_contamination": 9,
    "corpus_curate": 10,
    "corpus_dsir_weights": 8,
    "corpus_global_shuffle": 10,
    "corpus_hash_split": 10,
    "corpus_incremental_dedup": 8,
    "corpus_length_histogram": 8,
    "corpus_mixture_sample": 10,
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
    "customers_per_segment": 10,
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
    "documents_hashed_features": 10,
    "documents_nb_token_logodds": 8,
    "documents_sliding_chunks": 8,
    "dq_profile_orders": 9,
    "embedding_normalize": 7,
    "embedding_quantize": 8,
    "embedding_semantic_dedup": 10,
    "embeddings_kmeans_lloyd": 7,
    "embeddings_random_projection": 8,
    "embeddings_triplet_mining": 8,
    "etl_gapfill_hours": 8,
    "etl_gapfill_interp": 6,
    "etl_hourly_downsample": 10,
    "etl_incremental_agg_merge": 6,
    "etl_write_pipeline": 7,
    "events_ab_proportion_test": 10,
    "events_anomaly_zscore": 9,
    "events_audience_overlap": 10,
    "events_cm_frequency_rollup": 6,
    "events_cohort_retention": 9,
    "events_cuped_adjustment": 9,
    "events_cusum_changepoints": 8,
    "events_funnel": 9,
    "events_heavy_hitters": 6,
    "events_hll_daily_rollup": 10,
    "events_hourly_anomalies": 7,
    "events_in_prior_hour": 7,
    "events_interval_attribution": 9,
    "events_json_props_rollup": 8,
    "events_json_roundtrip": 10,
    "events_kaplan_meier_churn": 8,
    "events_markov_attribution": 8,
    "events_markov_transitions": 8,
    "events_ndcg_backtest": 8,
    "events_orc_roundtrip": 9,
    "events_pattern_users": 6,
    "events_pit_priority_lookup": 6,
    "events_quantile_sketch_rollup": 10,
    "events_seasonal_naive_backtest": 8,
    "events_seasonal_profile": 6,
    "events_welch_value_ttest": 10,
    "ewma_alerts_batch": 6,
    "lineitem_association_rules": 7,
    "lineitem_benford_audit": 8,
    "lineitem_bootstrap_mean_ci": 10,
    "lineitem_bootstrap_mean_ci_blb": 10,
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
    "lineitem_spearman_qty_price": 10,
    "lineitem_stump_splits": 7,
    "lineitem_weighted_price_quantiles": 6,
    "lineitem_winsorized_prices": 7,
    "monthly_active_customers": 6,
    "multimodal_audio_decimate": 10,
    "multimodal_decode": 9,
    "multimodal_decode_jpeg": 10,
    "multimodal_decode_png": 9,
    "multimodal_decode_wav": 9,
    "multimodal_image_near_dups": 10,
    "multimodal_jpeg_headers": 6,
    "multimodal_mp4_headers": 10,
    "multimodal_png_headers": 6,
    "multimodal_wav_headers": 6,
    "nation_customer_rollup": 7,
    "orders_aqp_revenue_estimate": 6,
    "orders_cdc_merge": 10,
    "orders_chi2_priority_status": 9,
    "orders_cube": 8,
    "orders_dp_noised_counts": 7,
    "orders_dq_constraints": 10,
    "orders_fd_violations": 7,
    "orders_gini_by_priority": 10,
    "orders_grouping_sets": 7,
    "orders_ivm_join_delta": 10,
    "orders_k_anonymity_audit": 6,
    "orders_kruskal_priority": 10,
    "orders_ks_price_drift": 10,
    "orders_lineitem_join_size_agms": 7,
    "orders_mannwhitney_price_drift": 10,
    "orders_mi_feature_cells": 8,
    "orders_moving_range_avg": 10,
    "orders_neyman_sample": 8,
    "orders_pivot_status": 7,
    "orders_psi_price_drift": 7,
    "orders_rollup": 6,
    "orders_scd2_priority": 10,
    "orders_schema_evolution_union": 6,
    "orders_skipping_bloom_scan": 6,
    "orders_skipping_scan": 6,
    "orders_skyline": 10,
    "orders_snapshot_diff": 10,
    "orders_table_fingerprint": 8,
    "orders_table_profile": 8,
    "orders_target_encode_priority": 8,
    "orders_window_suite": 6,
    "orders_woe_iv_priority": 8,
    "orders_zorder_key": 8,
    "part_copurchase_bfs": 10,
    "part_copurchase_kcore": 10,
    "part_copurchase_labelprop": 10,
    "part_copurchase_pagerank": 10,
    "part_copurchase_sssp": 10,
    "part_copurchase_triangles": 10,
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
    "q18_large_volume_customers": 10,
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
    "segment_active_customers": 10,
    "sessionize_events": 7,
    "similarity_topk": 10,
    "similarity_topk_ivf": 7,
    "similarity_topk_ivfpq": 10,
    "similarity_topk_lsh": 10,
    "similarity_topk_pq": 10,
    "streaming_attribution_join": 7,
    "streaming_cm_sketch": 6,
    "streaming_cusum_alerts": 9,
    "streaming_dedup_events": 7,
    "streaming_dim_enrich": 9,
    "streaming_ewma_alerts": 7,
    "streaming_hourly_downsample": 10,
    "streaming_sessionize": 7,
    "text_bm25_topk": 10,
    "text_compressibility": 10,
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
    "text_vocabulary": 10,
    "top10_orders_by_price": 6,
    "topk_per_segment": 10,
    "user_running_value": 7,
}

# PIN - the reference saved-query parity trio
# (reference sql/saved-queries.sql:10-45); never rotates out.
PIN: frozenset[str] = frozenset({
    "segment_active_customers",
    "customers_per_segment",
    "topk_per_segment",
})

# TOUCH - specs whose operator code changed and must re-earn a
# driver row (round 11). Six are the ROUND-10 BACKLOG (VERDICT r10
# wrong #3 - code-changed late in r10, after that round's TOUCH set
# was computed): embeddings_kmeans_lloyd (persist across Lloyd
# rounds + argmin expr, f5ee118; also carries the r11 -0.0
# sign-preserving literal emitter in cluster._sqdist_sql),
# customer_bloom_inactive (bitset literal + distinct seen side,
# b15ff27/5fcef98), lineitem_association_rules (in-plan denominator,
# 9e21ca1), orders_table_profile (widen, 9e21ca1), documents_bpe_*
# (triple-count batching bound, f84652b). Two are r11 code changes:
# part_copurchase_labelprop (early-exit count rides the checkpoint
# as an Observation metric) and dedup_minhash_lsh (the 64
# min-aggregates as ONE parsed expression, 386 -> 138 ms driver
# construction). NOT in TOUCH, with reasons: embedding_semantic_dedup
# - its r11 change REVERTS the r10 widen, restoring code verified
# AST-identical to the 510534a (r9) form that earned a green r9 row
# (and its r10 row, with the widen, was also green; the oracle pin
# in tests/test_workload_oracle.py covers it every round);
# similarity_topk_pq / similarity_topk_ivfpq - untouched in r11 (the
# -0.0 literal question in _pq_cent_literal is resolved by
# documentation, ADVICE r10 option 2: the flip is provably benign in
# squared-difference/ADC consumers, code byte-identical to r10);
# dedup_simhash - the minhash-style expression batching was measured
# (saves ~250 ms construction) and DEFERRED, not applied, exactly
# because no TOUCH slot remains for an off-bench spec (see the
# in-code note in operators/dedup.py). The budget: PIN(3) + these
# 8 TOUCH (3 inside the age-5 cohort, so 5 extra) + 4 wave-31 first
# rows + the 38-spec forced age-5 cohort = exactly 50.
TOUCH: frozenset[str] = frozenset({
    "embeddings_kmeans_lloyd",
    "customer_bloom_inactive",
    "lineitem_association_rules",
    "orders_table_profile",
    "documents_bpe_merges",
    "documents_bpe_token_counts",
    "part_copurchase_labelprop",
    "dedup_minhash_lsh",
})

# ADVISED - explicit re-verification asks from VERDICT r10: none
# beyond the TOUCH backlog above (the verdict's remaining items -
# pagerank ABA, widen re-ABA - resolved to measurements without code
# changes to their specs, or to TOUCH rows).
ADVISED: frozenset[str] = frozenset()

# DEFER_FIRST_ROW - EMPTY at r11: the four wave-31 inference specs
# deferred from round 10 (anova, levene, logrank, bh_fdr) take their
# first driver rows this round via the never-verified rule.
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
