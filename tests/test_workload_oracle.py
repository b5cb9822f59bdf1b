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
    """The driver records rows for at most DRIVER_QUERY_CAP queries
    (round 1: 53 registered, exactly the first 50 got rows). Exporting
    exactly the cap means no registered query is silently unverified;
    the round-1 orphans must be inside the export."""
    q = workload.queries()
    assert len(q) == workload.DRIVER_QUERY_CAP
    for orphan in (
        "embedding_normalize",
        "approx_distinct_users",
        "streaming_attribution_join",
        # round-2 packing/mixing family — must hold driver rows
        "corpus_pack_chunks",
        "corpus_pack_next_fit",
        "corpus_mixture_sample",
        "corpus_global_shuffle",
    ):
        assert orphan in q
