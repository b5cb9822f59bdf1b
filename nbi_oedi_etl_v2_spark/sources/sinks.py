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

from .fs import copy_file
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
        rel = src.lstrip("/").replace(":", "_")
        dest = os.path.join(dest_root, rel)
        copy_file(src, dest)
        copied.append(dest)
    return copied


def write_query_result(
    df: DataFrame, results_root: str, label: str, fmt: str = "parquet"
) -> str:
    """S9 — Athena workgroup result-sink analogue
    (lib/nbi-open-data-analytics-stack.ts:403-414): results for a
    named query land under ``query-results/{label}/``."""
    out = f"{results_root.rstrip('/')}/query-results/{label}"
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(out)
    elif fmt == "json":
        writer.json(out)
    else:
        writer.parquet(out)
    return out
