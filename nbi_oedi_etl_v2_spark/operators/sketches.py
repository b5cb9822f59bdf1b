"""Mergeable distinct-count sketches (Apache DataSketches HLL).

``approx_count_distinct`` answers one fixed question per scan. The
pattern a 100 TB event store actually needs is *pre-aggregation*:
materialize one small sketch per (day, dimension) — a few KB each —
then answer ANY later rollup (weekly, monthly, per-type, global) by
unioning sketches, never rescanning raw events. Union is associative
and commutative, so re-aggregation cost is proportional to the sketch
table (thousands of rows), not the event table (billions).

Spark 3.5+ exposes the DataSketches HLL family as codegen'd
aggregates: ``hll_sketch_agg`` (build), ``hll_union_agg`` (merge),
``hll_sketch_estimate`` (read out). The sketch column is plain
``binary`` — it parquets, shuffles, and broadcasts like any other
column, which is the whole point.

No DuckDB oracle: the binary sketch payload is engine-specific, so
the registered query is a rows-only driver check with an
estimate-vs-exact tolerance test in pytest (default lgConfigK=12
gives ~1.6% relative standard error; the fixture's key cardinalities
are far inside that envelope at the 5% assertion bar).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[Column | str],
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per group — the materialization
    step. One map-side-combined hash aggregate; the shuffle carries
    partial sketches (≤ 2^lgK bytes each), never keys."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(f"`{key_col}`"), lg_config_k).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_sketches(
    sketches: DataFrame, group_cols: list[Column | str]
) -> DataFrame:
    """Re-aggregate materialized sketches to a coarser grouping:
    union the sketch column, read out the estimate — AND keep the
    merged sketch itself, so rollups compose hierarchically
    (day → week → month each re-aggregates the previous level's
    ``sketch`` column, never the finest table). Input is the
    #groups-sized sketch table, so this never touches raw data.

    Determinism caveat (ADVICE r4): HLL sketch BYTES depend on merge
    order, so the ``sketch`` column is not stable across partitionings
    — consumers that hash or compare whole rows must ``.drop("sketch")``
    first (the registered workload query does exactly that and
    compares only the estimate). ``approx_distinct`` and ``n_rows``
    are order-independent."""
    merged = F.hll_union_agg("sketch")
    return sketches.groupBy(*group_cols).agg(
        merged.alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    ).withColumn(
        "approx_distinct",
        F.hll_sketch_estimate("sketch").cast("bigint"),
    )
