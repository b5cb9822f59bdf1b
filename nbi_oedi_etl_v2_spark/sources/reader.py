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
    spark: SparkSession,
    config: ETLConfig,
    job: JobConfig,
    ignore_corrupt: bool = True,
) -> DataFrame:
    """The S1 scan + P1 partition predicate for one job.

    ``upgrade`` / ``state`` are Hive partition columns; the ``where``
    below compiles to partition pruning (verify: ``.explain`` shows
    the pruned ``PartitionFilters``, no data files outside the
    selected partitions are ever opened).

    ``ignore_corrupt`` reproduces the reference's corrupt-file story
    (README.md:465-466: one corrupt input is *reported* in the run
    summary, the job completes): unreadable files are skipped by the
    scan and surface via the pipeline's listed-vs-read accounting
    instead of failing the job. Scoped as a reader option, not a
    session conf, so analytical queries still fail loudly on rot.
    """
    reader = spark.read
    if ignore_corrupt:
        # mergeSchema makes schema inference read every footer (as a
        # parallel job) instead of just the first file — necessary so
        # a corrupt FIRST file doesn't kill inference before
        # ignoreCorruptFiles can skip it. The release schema is
        # uniform, so merging is semantics-neutral; the cost is one
        # distributed footer pass, same order as the accounting probe.
        reader = reader.option("ignoreCorruptFiles", "true").option(
            "mergeSchema", "true"
        )
    df = reader.parquet(release_root(config, job))
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


INGEST_FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-agnostic ingestion (beyond-reference: the reference lake
    is parquet-only, but a complete engine must take csv/json deliveries).

    Scale rules encoded here rather than left to callers:
    - csv/json REQUIRE an explicit schema at scale — inference scans
      the data once extra and funnels samples through the driver, so
      it is only tolerated when ``schema`` is omitted AND
      ``allow_infer`` is passed (tests, exploration);
    - csv defaults: header on, quoted-newline support (multiLine) off
      unless requested — multiLine csv files are NOT splittable, a
      10 GB multiLine file becomes one task; prefer escaped newlines;
    - json means json-lines (the splittable layout); multiLine json
      (one document per file) is for small config payloads only.
    """
    if fmt not in INGEST_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {INGEST_FORMATS}")
    paths = path if isinstance(path, list) else [path]
    reader = spark.read
    if fmt in ("csv", "json"):
        if schema is not None:
            reader = reader.schema(schema)
        elif not options.pop("allow_infer", False):
            raise ValueError(
                f"{fmt} at scale requires an explicit schema "
                "(pass allow_infer=True to sample-infer in tests)"
            )
        else:
            reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(*paths)
