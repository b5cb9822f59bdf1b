"""operators/_scale: the shared narrow-scan-funnel guard (r10,
VERDICT r9 missing #1 + wrong #2 — plan-stats probe, no .rdd)."""

import pytest


def test_bytes_conf_parses_spark_conventions(spark):
    from nbi_oedi_etl_v2_spark.operators._scale import _bytes_conf

    spark.conf.set("x.test.bytes", "128MB")
    assert _bytes_conf(spark, "x.test.bytes", "1b") == 128 * (1 << 20)
    spark.conf.set("x.test.bytes", "4194304b")
    assert _bytes_conf(spark, "x.test.bytes", "1b") == 4 * (1 << 20)
    # bare number in the spark.sql.files.* family means BYTES (NOT
    # MiB — that is the JVM-memory convention, a different parser)
    spark.conf.set("x.test.bytes", "4194304")
    assert _bytes_conf(spark, "x.test.bytes", "1b") == 4 * (1 << 20)
    spark.conf.set("x.test.bytes", "128mib")
    with pytest.raises(ValueError):
        _bytes_conf(spark, "x.test.bytes", "1b")
    spark.conf.unset("x.test.bytes")


def test_estimated_partitions_tracks_rdd_probe(spark, sf_dir):
    """The cheap plan-stats estimate must agree with the exact RDD
    probe on the scan-rooted inputs it guards (the funnel case)."""
    from nbi_oedi_etl_v2_spark.operators._scale import (
        estimated_plan_partitions,
    )

    for t in ("documents", "lineitem", "orders"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        assert estimated_plan_partitions(df) == df.rdd.getNumPartitions(), t


def test_widen_narrow_input_widens_and_passes_wide(spark, sf_dir):
    from nbi_oedi_etl_v2_spark.operators._scale import widen_narrow_input

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.rdd.getNumPartitions() < target  # the funnel premise
    widened = widen_narrow_input(docs)
    assert widened.rdd.getNumPartitions() == target
    # row-identical — round-robin only moves rows
    assert widened.count() == docs.count()
    # a scan already at-or-above the target passes through untouched
    # (the 100 TB case); the probe is scan-rooted, so test it on a
    # scan with the target lowered to the scan's own width
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    scan_parts = li.rdd.getNumPartitions()
    spark.conf.set("spark.sql.shuffle.partitions", str(scan_parts))
    try:
        assert widen_narrow_input(li) is li
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
