"""Partition-pruned reads of the OEDI-shaped lake (SURVEY §2.1 S1/S2, §2.2 P1).

The reference enumerates S3 prefixes by hand per (upgrade, state)
(indexer.py:180-240). Spark-first, the whole release is ONE
partitioned-parquet read and the config's partition predicate is a
WHERE on the partition columns — Catalyst's partition pruning then
lists only the matching directories, which is exactly the manual
prefix enumeration, but it composes with downstream filters, survives
schema evolution, and parallelizes the listing on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .paths import release_root, resolve_metadata_paths
from ..config import ETLConfig, JobConfig


def read_timeseries(
    spark: SparkSession, config: ETLConfig, job: JobConfig
) -> DataFrame:
    """The S1 scan + P1 partition predicate for one job.

    ``upgrade`` / ``state`` are Hive partition columns; the ``where``
    below compiles to partition pruning (verify: ``.explain`` shows
    the pruned ``PartitionFilters``, no data files outside the
    selected partitions are ever opened).
    """
    df = spark.read.parquet(release_root(config, job))
    pred = F.col("state") == job.state
    # partition values parse as strings or ints depending on layout;
    # compare as strings for both (Catalyst still prunes on the cast).
    pred &= F.col("upgrade").cast("string").isin([str(u) for u in job.upgrades])
    return df.where(pred)


def read_metadata(spark: SparkSession, job: JobConfig) -> DataFrame:
    """S2 — version-dispatched direct-path metadata read."""
    paths = resolve_metadata_paths(job)
    if not paths:
        raise ValueError(f"no metadata paths resolve for job {job.job_name}")
    return spark.read.parquet(*paths)
