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


def test_driver_export_fills_cap_exactly():
    """The driver records rows for at most DRIVER_QUERY_CAP queries.
    Exporting exactly the cap means no driver slot is wasted; the
    round-3 rotation promotions (queries that had never earned a
    driver row) must be inside the export, and no operator family may
    lose its last driver row to a demotion."""
    q = workload.queries()
    assert len(q) == workload.DRIVER_QUERY_CAP
    for promoted in (
        "q7_volume_shipping",
        "q10_returned_items",
        "q14_promo_revenue",
        "text_lm_scores",
        "text_repetition_scores",
        "etl_gapfill_hours",
        "orders_zorder_key",
        "events_json_props_rollup",
        "multimodal_png_headers",
        "multimodal_wav_headers",
        "multimodal_decode_png",
        "multimodal_decode_wav",
        "corpus_budget_select",
        "corpus_incremental_dedup",
        "embedding_quantize",
        "corpus_source_stats",
        "corpus_length_histogram",
        "corpus_pack_ffd",
    ):
        assert promoted in q, promoted
    # each family keeps at least one driver row after the demotions
    families = {
        "etl": ["etl_hourly_downsample"],
        "tpch": ["q1_pricing_summary", "q18_large_volume_customers"],
        "grouping": ["orders_cube"],
        "window": ["topk_per_segment", "asof_last_order_per_event"],
        "dedup": ["dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh"],
        "similarity": ["similarity_topk", "embedding_normalize"],
        "text": ["text_token_stats", "text_language_id"],
        "streaming": ["streaming_hourly_downsample", "streaming_sessionize",
                      "streaming_ewma_alerts", "streaming_attribution_join"],
        "curation": ["dedup_components", "corpus_hash_split",
                     "corpus_balanced_shards", "corpus_contamination"],
        "packing": ["corpus_pack_chunks", "corpus_mixture_sample"],
        "sketch": ["approx_distinct_users"],
    }
    for fam, members in families.items():
        assert any(m in q for m in members), fam
