"""Batch ETL orchestrator (SURVEY §2.11 O1, §3 EP1 restated).

Per job (config.sample.json ``job_specific`` entry):

1. partition-pruned read of the 15-min time-series (S1/P1),
2. hourly downsample with the ``{col}_{fn}`` naming (A1/A2/F1/F2),
3. snappy parquet write partitioned by upgrade/state (S6),
4. byte-copy metadata bypass (S2/S7),
5. catalog registration replacing the Glue crawlers (S8),

then one run summary in the reference tracker's JSON shape
(tracker.py:291-392; sample at README.md:467-493).

Everything the reference does with worker pools, queues, poison
pills, crash monitors and back-pressure (O2/O3/O4, manager.py) is
absent by design: Spark's scheduler owns parallelism, retries
(``spark.task.maxFailures``) and memory. The tracker (O5) survives as
file-count accounting around the declarative pipeline — Spark either
completes a write atomically (via the parquet commit protocol) or
fails the job, so "listed vs uploaded" discrepancies become
input-vs-output file accounting rather than per-file hash sets.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

from py4j.protocol import Py4JJavaError
from pyspark.errors import PySparkException
from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from .config import ETLConfig, JobConfig
from .operators.downsample import downsample
from .sources import fs, paths, sinks
from .sources.catalog import register_etl_output
from .sources.reader import read_metadata, read_timeseries


def run_timestamp() -> str:
    # main.py:47-49 — run-scoped output dir timestamp
    return datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")


@dataclass
class JobResult:
    job_name: str
    data_path: str
    metadata_files: list[str]
    data_files_listed: int
    data_files_written: int
    metadata_files_listed: int
    metadata_files_uploaded: int
    # corrupt-file parity (reference README.md:465-466,
    # tracker.py:194-289): inputs listed but skipped by the scan
    # (ignoreCorruptFiles) are reported, not fatal
    data_files_read: int = 0
    missing_data_files: list[str] = field(default_factory=list)
    # O5 row-level accounting via df.observe(): collected as a side
    # effect of the write itself (no extra pass over the data), the
    # Spark-native replacement for the reference tracker's per-file
    # fetched/transformed event counts (tracker.py:103-144)
    rows_read: int = 0
    rows_written: int = 0


@dataclass
class RunSummary:
    total_time_seconds: float = 0.0
    jobs: list[JobResult] = field(default_factory=list)

    def to_reference_json(self) -> str:
        """The README.md:467-493 summary shape."""
        data_listed = sum(j.data_files_listed for j in self.jobs)
        data_written = sum(j.data_files_written for j in self.jobs)
        meta_listed = sum(j.metadata_files_listed for j in self.jobs)
        meta_uploaded = sum(j.metadata_files_uploaded for j in self.jobs)
        missing_meta = {
            j.job_name: j.metadata_files_listed - j.metadata_files_uploaded
            for j in self.jobs
            if j.metadata_files_listed != j.metadata_files_uploaded
        }
        # a listed-but-unreadable input was "fetched" but never
        # transformed/uploaded — the reference's corrupt-file case
        # (README.md:465-466 narrative; discrepancy calc
        # tracker.py:194-289)
        missing_data = {
            j.job_name: j.missing_data_files
            for j in self.jobs
            if j.missing_data_files
        }
        missing_data_count = sum(len(v) for v in missing_data.values())
        return json.dumps(
            {
                "time_stat": {"total_time_seconds": round(self.total_time_seconds, 2)},
                "data_files_stats": {
                    "total_data_files_listed": data_listed,
                    "total_data_files_uploaded": data_written,
                    "missing_data_fetches_count": 0,
                    "missing_data_transforms_count": missing_data_count,
                    "missing_data_uploads_count": missing_data_count,
                    "missing_data_fetches_files": {},
                    "missing_data_transforms_files": missing_data,
                    "missing_data_uploads_files": missing_data,
                },
                "metadata_files_stats": {
                    "total_metadata_files_listed": meta_listed,
                    "total_metadata_files_uploaded": meta_uploaded,
                    "missing_metadata_fetches_count": len(missing_meta),
                    "missing_metadata_bypasses_count": len(missing_meta),
                    "missing_metadata_uploads_count": len(missing_meta),
                    "missing_metadata_fetches_files": missing_meta,
                    "missing_metadata_bypasses_files": missing_meta,
                    "missing_metadata_uploads_files": missing_meta,
                },
            },
            indent=4,
        )


def run_job(
    spark: SparkSession,
    config: ETLConfig,
    job: JobConfig,
    output_root: str,
    run_ts: str,
) -> JobResult:
    # S1/P1 — one partitioned read, Catalyst prunes to the configured
    # (upgrade, state) directories.
    ts_df = read_timeseries(spark, config, job)
    obs_in = Observation(f"{job.job_name}_in")
    ts_df = ts_df.observe(obs_in, F.count(F.lit(1)).alias("rows_read"))

    # A1/A2/F1/F2 — the hourly transform. Partition columns pass
    # through as group-key-independent `min` aggregates would mangle
    # them, so keep them as extra grouping keys: they're constant per
    # input partition and must survive for partitionBy on write.
    extra_keys = [c for c in ("upgrade", "state") if c in ts_df.columns]
    hourly = downsample(ts_df, timestamp_col="timestamp", entity_col="bldg_id",
                        extra_group_cols=extra_keys)
    obs_out = Observation(f"{job.job_name}_out")
    hourly = hourly.observe(obs_out, F.count(F.lit(1)).alias("rows_written"))

    data_path = sinks.write_hourly_data(hourly, output_root, run_ts, job)

    # S2/S7 — resolve + byte-copy metadata.
    meta_srcs = [p for p in paths.resolve_metadata_paths(job) if fs.exists(p)]
    copied = sinks.bypass_metadata(meta_srcs, output_root, run_ts, job)

    # O5 discrepancy accounting (tracker.py:194-289 restated): the
    # full listing vs the files the scan could actually read. The
    # read-side probe is a footer-only job — zero data columns, one
    # file name per split — so it costs a listing, not a scan, even at
    # lake scale; corrupt inputs (skipped via ignoreCorruptFiles) are
    # exactly the difference.
    listed_files = [
        f
        for p in paths.data_partition_prefixes(config, job)
        for f in fs.list_files_recursive(p)
    ]
    distinct_read = ts_df.select(F.input_file_name().alias("f")).distinct()
    n_read = distinct_read.count()
    if n_read == len(listed_files):
        # happy path: counts agree, no file names cross the driver
        missing: list[str] = []
    else:
        read_files = {fs.normalize_uri(r["f"]) for r in distinct_read.collect()}
        candidates = sorted(set(map(fs.normalize_uri, listed_files)) - read_files)
        # a zero-row parquet file yields no input_file_name() rows but
        # is NOT corrupt — distributed writers produce empty parts
        # routinely. Re-probe each candidate with corrupt-skipping OFF
        # (the set is discrepancy-sized, not lake-sized): readable →
        # legitimately empty; raising → a confirmed discrepancy.
        missing = []
        for f in candidates:
            # only a Spark read/analysis failure marks a discrepancy; a
            # transient listing/IO hiccup gets ONE retry so a healthy
            # file is never misfiled as corrupt on a blip
            for attempt in (0, 1):
                try:
                    spark.read.option(
                        "ignoreCorruptFiles", "false"
                    ).parquet(f).count()
                    break
                except (PySparkException, Py4JJavaError):
                    if attempt == 1:
                        missing.append(f)
    written = len(fs.list_files_recursive(data_path))
    return JobResult(
        job_name=job.job_name,
        data_path=data_path,
        metadata_files=copied,
        data_files_listed=len(listed_files),
        data_files_written=written,
        metadata_files_listed=len(meta_srcs),
        metadata_files_uploaded=len(copied),
        data_files_read=n_read,
        missing_data_files=missing,
        rows_read=int(obs_in.get["rows_read"]),
        rows_written=int(obs_out.get["rows_written"]),
    )


def run_etl(
    spark: SparkSession,
    config: ETLConfig,
    output_root: str | None = None,
    register_catalog: bool = True,
    db: str = "nbi_analytics",
    max_concurrent_jobs: int = 1,
) -> RunSummary:
    """EP1 end-to-end: all jobs, then catalog registration (O7 —
    the reference's on-success crawler trigger becomes sequential
    driver code).

    ``max_concurrent_jobs > 1`` submits jobs from a thread pool — the
    reference's worker-pool knob (O2) reduced to letting Spark's FIFO
    scheduler interleave independent write pipelines; output paths are
    disjoint per job, so no coordination is needed. Catalog updates
    stay serialized on the driver either way.
    """
    t0 = time.perf_counter()
    run_ts = run_timestamp()
    output_root = output_root or config.output_dir
    summary = RunSummary()

    if max_concurrent_jobs > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent_jobs) as pool:
            results = list(
                pool.map(
                    lambda job: run_job(spark, config, job, output_root, run_ts),
                    config.job_specific,
                )
            )
    else:
        results = [
            run_job(spark, config, job, output_root, run_ts)
            for job in config.job_specific
        ]

    for job, result in zip(config.job_specific, results):
        summary.jobs.append(result)
        if register_catalog:
            register_etl_output(
                spark,
                db=db,
                data_path=result.data_path,
                metadata_paths_or_root=sinks.metadata_output_path(
                    output_root, run_ts, job
                ),
                data_table_prefix=f"data_{job.job_name}".lower(),
                metadata_table_prefix=f"metadata_{job.job_name}".lower(),
                states=[job.state],
            )

    summary.total_time_seconds = time.perf_counter() - t0
    return summary
