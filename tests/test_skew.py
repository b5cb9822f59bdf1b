"""Salted formulations must equal their unsalted twins exactly —
salting redistributes work, never results."""

from __future__ import annotations

from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators.skew import salted_aggregate, salted_join
from nbi_oedi_etl_v2_spark.tables import load_table


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", "l_orderkey"),
            "qty_min": ("min", "l_quantity"),
            "qty_max": ("max", "l_quantity"),
        },
        salt_buckets=8,
        spread_col="l_orderkey",
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("n"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
    )
    assert _rows(salted) == _rows(plain)


def test_salted_aggregate_splits_groups(spark, sf_dir):
    # the partial stage must produce multiple sub-groups per hot key
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(8))
    )
    sub = salted.groupBy("l_returnflag", "__salt").count()
    per_key = sub.groupBy("l_returnflag").count().collect()
    assert all(r["count"] > 1 for r in per_key)


def test_salted_join_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    salted = salted_join(o, c, "o_custkey", "c_custkey", salt_buckets=4)
    plain = o.join(c, o.o_custkey == c.c_custkey).select(
        *[o[f"`{x}`"] for x in o.columns],
        *[c[f"`{x}`"] for x in c.columns if x != "c_custkey"],
    )
    assert salted.columns == plain.columns
    assert _rows(salted) == _rows(plain)
    assert salted.count() == plain.count()
