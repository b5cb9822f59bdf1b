"""Sinks (SURVEY §2.1 S6/S7/S9).

Output layout parity with the reference
(worker.py:200-210 + main.py:47-49): everything for a run lands under
``{output_root}/{run_ts}/{job_name}/...``; transformed data keeps its
``upgrade=/state=`` partition dirs (Spark's ``partitionBy`` recreates
them), metadata bypass files keep their full source-relative key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fs import copy_file, normalize_uri
from ..config import JobConfig


def data_output_path(output_root: str, run_ts: str, job: JobConfig) -> str:
    return f"{output_root.rstrip('/')}/{run_ts}/{job.job_name}/data"


def metadata_output_path(output_root: str, run_ts: str, job: JobConfig) -> str:
    return f"{output_root.rstrip('/')}/{run_ts}/{job.job_name}/metadata"


def write_hourly_data(
    df: DataFrame,
    output_root: str,
    run_ts: str,
    job: JobConfig,
    partition_cols: tuple[str, ...] = ("upgrade", "state"),
) -> str:
    """S6 — snappy parquet sink, hive-partitioned by upgrade/state.

    Scale note: upstream of this write the downsample already grouped
    by (hour, bldg_id), so rows arrive hash-distributed on those keys;
    ``partitionBy`` here only splits each task's output by the two
    low-cardinality partition columns — no extra shuffle. At 100 TB,
    repartition on the partition columns first ONLY if small-files
    pressure appears (AQE coalescing usually suffices).
    """
    out = data_output_path(output_root, run_ts, job)
    cols_present = [c for c in partition_cols if c in df.columns]
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if cols_present:
        writer = writer.partitionBy(*cols_present)
    writer.parquet(out)
    return out


def bypass_metadata(
    src_paths: list[str], output_root: str, run_ts: str, job: JobConfig
) -> list[str]:
    """S7 — byte-copy metadata files unchanged (worker.py:171-173).

    Exact parity demands an object copy, not read→rewrite (a parquet
    round-trip could alter row-group layout / stats and break
    bit-level comparisons downstream).
    """
    dest_root = metadata_output_path(output_root, run_ts, job)
    copied = []
    for src in src_paths:
        # scheme-normalize so file:-URI sources keep the same
        # source-relative key layout as plain local paths
        rel = normalize_uri(src).lstrip("/").replace(":", "_")
        dest = os.path.join(dest_root, rel)
        copy_file(src, dest)
        copied.append(dest)
    return copied


def write_query_result(
    df: DataFrame, results_root: str, label: str, fmt: str = "parquet",
    single_file: bool = True,
) -> str:
    """S9 — Athena workgroup result-sink analogue
    (lib/nbi-open-data-analytics-stack.ts:403-414): results for a
    named query land under ``query-results/{label}/``.

    ``single_file`` mirrors Athena's one-result-object convention and
    is right for human-sized result sets; pass False for large
    extracts so the write keeps its parallelism instead of funneling
    through one task."""
    out = f"{results_root.rstrip('/')}/query-results/{label}"
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(out)
    elif fmt == "json":
        writer.json(out)
    else:
        writer.parquet(out)
    return out


def upsert_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partition-level upsert: overwrite ONLY the partitions present in
    ``df``, leaving every other partition untouched — the re-run story
    (one state's job failed; rewrite that state without clobbering the
    lake).

    Uses dynamic partition overwrite (scoped to this write via the
    writer option, not a session-level conf flip): Spark deletes and
    rewrites exactly the partition directories the incoming data maps
    to. No read-modify-write of the whole table, no global lock —
    partitions are the transaction unit, which is the only transaction
    unit that scales to a 100 TB lake without a table format's log.
    Row-level merge semantics need Delta/Iceberg; this is deliberately
    the format-free subset.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_partitions(
    spark, path: str, partition_cols: list[str], target_records_per_file: int
) -> int:
    """Small-file compaction: rewrite each partition's many small files
    into files of ~``target_records_per_file`` rows. Returns the number
    of rows compacted.

    Small files are the classic lake degradation (per-file open cost,
    tiny row groups, listing pressure). The rewrite shuffles once,
    hash-partitioned on the partition columns so each output partition
    is written by tasks that hold only that partition's rows, and
    ``maxRecordsPerFile`` caps file size.

    Executed as a **staged swap**: compact into a sibling staging
    directory while the source stays untouched, then
    source → backup, staging → source, drop backup. A crash at any
    point leaves at least one complete copy on disk — unlike an
    in-place dynamic overwrite, where losing an executor (and its
    localCheckpoint blocks) mid-write after partition dirs were
    cleared would lose data, not just the compaction.
    """
    from . import fs

    staging = path.rstrip("/") + ".compact-staging"
    backup = path.rstrip("/") + ".compact-old"
    fs.delete(staging)
    df = spark.read.parquet(path)
    n_rows = df.count()
    (
        df.repartition(*[F.col(f"`{c}`") for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(staging)
    )
    fs.delete(backup)
    # Hadoop rename reports failure by RETURNING false, not raising —
    # and renaming into a still-existing target nests staging INSIDE
    # it. Abort loudly instead of silently corrupting the dataset.
    if not fs.rename(path, backup):
        raise IOError(f"compact: rename {path} -> {backup} failed; aborting swap")
    if not fs.rename(staging, path):
        fs.rename(backup, path)  # roll back; original data untouched
        raise IOError(f"compact: rename {staging} -> {path} failed; rolled back")
    fs.delete(backup)
    return n_rows
