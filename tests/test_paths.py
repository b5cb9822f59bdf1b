"""Metadata path resolver + named-query parser unit tests
(SURVEY §2.1 S2/S3, §2.11 O9)."""

from __future__ import annotations

from nbi_oedi_etl_v2_spark.plans.query_registry import parse_named_queries, slug
from nbi_oedi_etl_v2_spark.sources.paths import (
    metadata_relative_paths,
    upgrade_str,
)


def test_upgrade_str():
    # indexer.py:64
    assert upgrade_str("0") == "baseline"
    assert upgrade_str(0) == "baseline"
    assert upgrade_str("1") == "upgrade01"
    assert upgrade_str(12) == "upgrade12"


def test_v1_paths():
    assert metadata_relative_paths("1", "AK", "0") == [
        "by_state/state=AK/parquet/AK_baseline_metadata_and_annual_results.parquet"
    ]


def test_v2_paths():
    got = metadata_relative_paths("2", "CA", "1", ["G0601150", "G0601130"])
    assert got == [
        "by_state_and_county/full/parquet/state=CA/county=G0601150/CA_G0601150_upgrade01.parquet",
        "by_state_and_county/full/parquet/state=CA/county=G0601130/CA_G0601130_upgrade01.parquet",
    ]


def test_v3_paths():
    assert metadata_relative_paths("3", "AK", "0", ["G0200130"]) == [
        "by_state_and_county/full/parquet/state=AK/county=G0200130/AK_G0200130_baseline_agg.parquet"
    ]
    assert metadata_relative_paths("3", "AK", "0") == [
        "by_state/full/parquet/state=AK/AK_baseline_agg.parquet"
    ]


def test_invalid_prefix_type():
    import pytest

    with pytest.raises(ValueError):
        metadata_relative_paths("9", "AK", "0")


def test_slug():
    # stack.ts:471-477 semantics
    assert slug("Total Number of Individual Building Models") == (
        "total_number_of_individual_building_models"
    )
    assert slug("Top-K per Group!") == "topk_per_group"


def test_parse_named_queries():
    # labels must sit at line start, as in the reference's split regex
    text = (
        "/* header\ncomment */\n"
        "-- label: First Query\n"
        "-- description: does a thing\n"
        "SELECT * FROM ${db}.${prefix} _parquet; -- trailing note\n"
        "-- label: Second\n"
        "SELECT 1;\n"
    )
    qs = parse_named_queries(text)
    assert [q.name for q in qs] == ["first_query", "second"]
    assert qs[0].description == "does a thing"
    # reference's `_ +` cleanup (stack.ts:490): a prefix ending in `_`
    # plus ` _parquet` collapses to the crawler's `__parquet` shape
    rendered = qs[0].render({"db": "mydb", "prefix": "meta_"})
    assert rendered == "SELECT * FROM mydb.meta__parquet"


def test_spaced_placeholders():
    # the reference SQL writes `$ { glue_db }` with spaces
    qs = parse_named_queries("-- label: X\nSELECT * FROM $ { db }.t;")
    assert qs[0].render({"db": "d"}) == "SELECT * FROM d.t"
