"""File-level min/max data-skipping index — partition pruning's
finer-grained sibling.

Hive-style partition pruning (``sources/reader.py``) skips whole
directories; parquet row-group stats skip *within* a file the scan
already opened. In between sits the file-level zone map this module
builds: one (file, min, max, n_rows) row per data file per indexed
column — the same manifest statistics Delta Lake / Iceberg keep in
their table logs, built here from plain Spark aggregates so it works
on a bare parquet directory.

At 100 TB the index is built incrementally at write time (each job
appends its own files' stats — the aggregate is per-file, so stats
for new files never touch old ones); ``build_skipping_index`` is the
batch backfill formulation, one column-pruned scan. The index itself
is #files-sized — thousands of rows for a 100 TB table — so pruning
evaluates driver-side against a table that is *itself* a small
DataFrame, and only surviving file paths (a list bounded by #files)
cross to the re-read. Combined with a Z-order layout
(``operators/layout.py``) the index prunes on EVERY interleaved
dimension, not just the sort prefix.

Pruning is conservative by construction: a file survives unless its
[min, max] interval provably misses the predicate range, so the
skipped scan is always a superset of the true result and the caller's
row-level filter (which Spark pushes to the parquet reader anyway)
finishes the job. NULL stats (all-null column in a file) keep the
file — never skip what you cannot prove.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILE_COL = "_file"

# a whole directory segment of the form key=value (Hive partition dir)
_HIVE_SEGMENT = re.compile(r"^[^/=]+=[^/]*$")


def _strip_scheme(p: str) -> str:
    """Normalize a path or URI to a bare absolute path: drop the
    scheme//authority prefix (``file:///x``, ``hdfs://nn/x``) or a
    schemeless ``file:/x`` form, and any trailing slash — so index
    entries (qualified URIs from ``_metadata.file_path``) and caller
    paths (often bare) compare in the same namespace (ADVICE r4)."""
    if "://" in p:
        p = p.split("://", 1)[1]
        # keep hdfs://host/path host out of the path part
        if not p.startswith("/"):
            p = p[p.index("/"):] if "/" in p else "/"
    elif p.startswith("file:/"):
        p = p[len("file:"):]
    return "/" + p.strip("/")


def _partition_dir_segments(file_path: str, root: str) -> list[str]:
    """Directory segments strictly between the table root and the leaf
    file name. If the file doesn't align under the root (relative vs
    absolute, different mount spellings) fall back to every directory
    segment of the file path — still leaf-name-exclusive, so a legal
    ``=`` in a FILE name never trips the Hive guard."""
    f, r = _strip_scheme(file_path), _strip_scheme(root)
    if f.startswith(r + "/"):
        rel = f[len(r) + 1:]
        return rel.split("/")[:-1]
    return f.split("/")[1:-1]


def build_skipping_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One (file, n_rows, {col}_min, {col}_max …) row per data file.

    Uses the ``_metadata.file_path`` hidden column (constant per
    split, so the aggregate is map-side trivial) and reads ONLY the
    indexed columns — the scan's ``ReadSchema`` stays narrow no matter
    how wide the table is.
    """
    if not cols:
        raise ValueError("need at least one column to index")
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(f"`{c}`")).alias(f"{c}_min"))
        aggs.append(F.max(F.col(f"`{c}`")).alias(f"{c}_max"))
    return (
        df.select(F.col("_metadata.file_path").alias(FILE_COL), *cols)
        .groupBy(FILE_COL)
        .agg(*aggs)
    )


def prune_files(index: DataFrame, ranges: dict[str, tuple]) -> list[str]:
    """File paths whose zone intervals overlap every predicate range.

    ``ranges`` maps column → (lo, hi), either bound ``None`` for
    unbounded. A file is dropped only when provably disjoint:
    ``{c}_max < lo`` or ``{c}_min > hi`` — with null-safe logic that
    KEEPS files whose stats are NULL. The collect is #surviving-files
    rows of one string column, never data.
    """
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        mn, mx = F.col(f"`{c}_min`"), F.col(f"`{c}_max`")
        if lo is not None:
            cond = cond & ~(mx < F.lit(lo)).eqNullSafe(F.lit(True))
        if hi is not None:
            cond = cond & ~(mn > F.lit(hi)).eqNullSafe(F.lit(True))
    return [r[FILE_COL] for r in index.where(cond).select(FILE_COL).collect()]


READ_BATCH_FILES = 10_000


def read_with_skipping(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    ranges: dict[str, tuple],
    batch_files: int = READ_BATCH_FILES,
) -> DataFrame:
    """Read only the files the index cannot rule out, then apply the
    range predicate row-level (skipping is a superset; the residual
    filter also reaches the parquet reader as a pushed filter for
    row-group pruning inside surviving files).

    Scale bounds: the surviving-path list is #files-sized — the same
    driver-side footprint Delta/Iceberg pay to resolve a manifest. At
    10⁶-file scale a single ``parquet(*paths)`` call would push one
    enormous file list through the DataSource; paths are therefore
    handed off in ``batch_files``-sized reads unioned lazily, keeping
    each relation's file list bounded while Spark still schedules one
    job over the union.

    The table schema is pinned from ONE surviving file's footer (not a
    full-directory inference pass, which would re-read every pruned
    footer). This module indexes flat parquet directories only: with a
    Hive-partitioned layout the partition columns live in directory
    names, not footers, and reading leaf files under a pinned schema
    would silently yield NULLs — so partitioned layouts are rejected.
    Partitioned tables get directory-level pruning from
    ``sources/reader.py`` first; this index applies within a leaf.

    An empty surviving set returns an empty DataFrame with the table's
    schema, so downstream code never branches.
    """
    files = prune_files(index, ranges)
    if any(
        _HIVE_SEGMENT.match(seg)
        for f in files
        for seg in _partition_dir_segments(f, path)
    ):
        raise ValueError(
            "read_with_skipping requires a flat (non-partitioned) "
            "parquet directory; Hive-partitioned layouts would lose "
            "partition columns under a footer-pinned schema"
        )
    if files:
        # one footer, not #files footers, fixes the schema
        schema = spark.read.parquet(files[0]).schema
    else:
        any_file = index.select(FILE_COL).first()
        if any_file is None:
            return spark.createDataFrame([], spark.read.parquet(path).schema)
        return spark.createDataFrame(
            [], spark.read.parquet(any_file[FILE_COL]).schema
        )
    batches = [
        files[i : i + batch_files] for i in range(0, len(files), batch_files)
    ]
    df = spark.read.schema(schema).parquet(*batches[0])
    for chunk in batches[1:]:
        df = df.unionByName(spark.read.schema(schema).parquet(*chunk))
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(f"`{c}`") >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(f"`{c}`") <= F.lit(hi))
    return df
