"""Bucketed tables must join and aggregate with no exchange on the
bucket key — the write-once-shuffle-never property the 100 TB layout
depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.sources.bucketing import bucketed_join_ready, write_bucketed
from nbi_oedi_etl_v2_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucket_specs_registered(spark, bucketed_tables):
    left, right = bucketed_tables
    assert bucketed_join_ready(spark, left, right)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # at test scale Spark would (rightly) broadcast the small side;
    # the merge hint forces the plan shape bucketing exists for at
    # fact×fact scale, where broadcast is off the table
    o = spark.table(left).hint("merge")
    li = spark.table(right)
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-bucketed on the join key → zero shuffle/broadcast exchanges,
    # and the groupBy on the same key reuses the bucket distribution.
    # (A per-partition Sort below the SMJ remains: Spark ignores
    # written bucket sort order on read unless
    # spark.sql.legacy.bucketedTableScan.outputOrdering is set —
    # cheap CPU, no network, so not asserted away.)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed = (
        spark.table(left)
        .join(spark.table(right), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    assert {tuple(r) for r in bucketed.collect()} == {tuple(r) for r in plain.collect()}
