"""Every registered workload query must hash-match its DuckDB oracle —
the local twin of the driver's CORRECTNESS_r{N}.json gate."""

from __future__ import annotations

import pytest

from nbi_oedi_etl_v2_spark import workload
from nbi_oedi_etl_v2_spark.testing import check_query

ALL_SPECS = workload.all_specs()  # includes pytest-only (driver=False)
ORACLE_SPECS = [s for s in ALL_SPECS.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in ALL_SPECS.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_query_matches_oracle(spark, sf_dir, spec):
    problems = check_query(spark, sf_dir, spec.fn, spec.oracle)
    assert not problems, f"{spec.name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_query_runs(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    df = entry_mod.entry(spark)
    assert df.count() > 0


# The 20 round-3 specs that had never earned a driver row through
# CORRECTNESS_r03 — round 4's rotation must verify every one, closing
# the "119/119 specs driver-verified at least once" goal (VERDICT r3
# next-round item 1).
NEVER_VERIFIED_THROUGH_R3 = (
    "corpus_weighted_reservoir",
    "customer_fuzzy_name_pairs",
    "dq_profile_orders",
    "embedding_semantic_dedup",
    "etl_gapfill_interp",
    "etl_incremental_agg_merge",
    "events_anomaly_zscore",
    "events_hll_daily_rollup",
    "events_json_roundtrip",
    "events_orc_roundtrip",
    "events_pattern_users",
    "lineitem_price_trend",
    "orders_cdc_merge",
    "orders_scd2_priority",
    "orders_skipping_scan",
    "orders_skyline",
    "orders_window_suite",
    "part_copurchase_triangles",
    "text_token_pmi",
    "text_vocabulary",
)


def test_driver_export_fills_cap_exactly():
    """The driver records rows for at most DRIVER_QUERY_CAP queries.
    Exporting exactly the cap means no driver slot is wasted.  Round-4
    policy (workload.DRIVER_EXPORT is the single source of truth):
    the reference saved-query parity trio is pinned permanently, the
    20 never-verified round-3 specs all get their first driver row,
    specs whose operators changed this round are re-proved, and no
    operator family loses its last driver row."""
    q = workload.queries()
    assert len(q) == workload.DRIVER_QUERY_CAP
    # PIN — the port of the reference's sql/saved-queries.sql:10-45;
    # the literal parity contract never rotates out (VERDICT r3 §gap 2)
    for pinned in (
        "segment_active_customers",
        "customers_per_segment",
        "topk_per_segment",
    ):
        assert pinned in q, f"parity trio member {pinned} rotated out"
    for promoted in NEVER_VERIFIED_THROUGH_R3:
        assert promoted in q, promoted
    # NEW — every operator added in round 4 gets its first driver row
    for new_r4 in (
        "multimodal_jpeg_headers",
        "events_heavy_hitters",
        "events_interval_attribution",
        "orders_moving_range_avg",
        "text_compressibility",
        "multimodal_image_near_dups",
        "multimodal_audio_decimate",
    ):
        assert new_r4 in q, new_r4
    # each family keeps at least one driver row after the demotions
    families = {
        "etl": ["etl_hourly_downsample", "etl_gapfill_interp"],
        "tpch": ["q1_pricing_summary", "q18_large_volume_customers"],
        "grouping": ["orders_cube", "orders_skyline"],
        "window": ["orders_window_suite", "events_cohort_retention"],
        "dedup": ["dedup_ngram_jaccard", "dedup_minhash_lsh",
                  "embedding_semantic_dedup"],
        "similarity": ["similarity_topk", "similarity_topk_ivf"],
        "text": ["text_vocabulary", "text_token_pmi"],
        "retrieval": ["text_inverted_index", "text_bm25_topk"],
        "streaming": ["streaming_hourly_downsample"],
        "curation": ["corpus_contamination", "corpus_weighted_reservoir"],
        "packing": ["corpus_pack_ffd"],
        "multimodal": ["multimodal_decode_png", "multimodal_decode_wav",
                       "multimodal_decode"],
        "graph": ["part_copurchase_pagerank", "part_copurchase_triangles"],
        "sketch": ["dedup_minhash_lsh", "events_hll_daily_rollup"],
        "history": ["orders_scd2_priority", "orders_cdc_merge"],
        "formats": ["events_json_roundtrip", "events_orc_roundtrip"],
        "quality": ["dq_profile_orders"],
    }
    for fam, members in families.items():
        assert any(m in q for m in members), fam
