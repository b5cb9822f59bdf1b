"""Bucketed-table utilities: shuffle-free co-located joins at scale.

The biggest repeated cost in a 100 TB warehouse is re-shuffling the
same fact table on the same key for every join. Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows
into a fixed number of files per partition, and Spark records the
bucket spec in the catalog. A join (or aggregation) on the bucket key
between two tables bucketed the same way requires NO exchange — each
task zips bucket i with bucket i.

Sizing rule of thumb: buckets ≈ (table bytes / desired task input);
both join sides must share the bucket count (or one must be a
multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins on (bucket, sort) keys.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both catalog tables carry a bucket spec (the
    precondition for an exchange-free join on the bucket key)."""
    def spec(t: str) -> str | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        for r in rows:
            if r["col_name"] == "Num Buckets":
                return r["data_type"]
        return None

    return spec(left) is not None and spec(right) is not None
