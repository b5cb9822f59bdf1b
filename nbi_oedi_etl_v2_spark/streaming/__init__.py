"""Structured Streaming surface (north-star extension; SURVEY §2.9
notes the reference is batch-only and maps its hourly downsample 1:1
onto ``groupBy(window(ts, "1 hour"), entity)`` with a watermark).

Design:

- **Stateless operators compose for free.** Every map-only operator in
  this package (text quality/language-ID/fingerprint, projections,
  filters) works unchanged on a streaming DataFrame — Catalyst plans
  are source-agnostic. Only the stateful ones need streaming twins.
- **Hourly downsample** (``hourly_downsample_stream``): the batch
  operator's exact ``{col}_{fn}`` schema (shared agg builder,
  operators/downsample.py), grouped by ``window(ts, granularity)``
  instead of ``date_trunc`` so watermark-based state eviction works in
  append mode. The timestamp is floored *before* windowing, making
  ``ts_min`` equal the window start — bit-identical to the batch path.
- **Sessionization** (``sessionize_stream``): ``F.session_window``
  (gap-merged event-time windows) — the built-in stateful analogue of
  the batch lag-gap + running-sum formulation.
- **Replay dedup** (``dedup_stream``): ``dropDuplicates`` keyed on the
  event id with a watermark bounding the dedup state — the standard
  exactly-once projection of an at-least-once transport.

Scale posture (100 TB/day firehose): all state is keyed and
watermark-evicted — state size is O(active keys in the watermark
horizon), not O(stream length); shuffle partitioning follows the
grouping keys exactly as in batch. Tests drive everything through
``trigger(availableNow=True)`` into a memory sink, which processes the
backlog deterministically and terminates — the same query text would
run unbounded against a live source.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.downsample import DECIMAL_PLACES, classify_aggregates
from ..tables import _nano_timestamp_cols
from ..session import tune_session


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source streaming read of a driver table, schema-locked to
    the batch read (file streams require an explicit schema) with the
    same TIMESTAMP(NANOS) → microsecond-timestamp conversion as
    ``tables.load_table``."""
    tune_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    raw_schema = spark.read.parquet(path).schema
    # FileStreamSource requires a directory (it sets basePath to the
    # source path internally); stage a per-table symlink directory so
    # the read-only single-file tables stream without copying bytes
    stage = tempfile.mkdtemp(prefix=f"stream_{name}_")
    os.symlink(os.path.abspath(path), os.path.join(stage, f"{name}.parquet"))
    df = spark.readStream.schema(raw_schema).parquet(stage)
    for c in _nano_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def hourly_downsample_stream(
    df: DataFrame,
    timestamp_col: str = "ts",
    entity_col: str | None = "user_id",
    granularity: str = "hour",
    watermark: str = "2 hours",
    decimal_places: int = DECIMAL_PLACES,
) -> DataFrame:
    """Streaming twin of ``operators.downsample.downsample``: same
    ``{col}_{fn}`` output schema, windowed + watermarked grouping.

    Late data within ``watermark`` is merged into its hour; anything
    later is dropped and the hour's state evicted (append mode emits
    each hour exactly once, after the watermark passes it).
    """
    window_len = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}[granularity]
    floored = df.withColumn(
        timestamp_col, F.date_trunc(granularity, F.col(f"`{timestamp_col}`"))
    ).withWatermark(timestamp_col, watermark)

    keys = [timestamp_col]
    if entity_col is not None and entity_col in df.columns:
        keys.append(entity_col)
    aggs, ordered = classify_aggregates(df, keys, [], decimal_places)

    out = floored.groupBy(
        F.window(F.col(f"`{timestamp_col}`"), window_len),
        *[F.col(f"`{k}`") for k in keys if k != timestamp_col],
    ).agg(*aggs)
    # the floored ts is constant within its window → window.start
    out = out.withColumn(timestamp_col, F.col("window.start")).drop("window")
    return out.select(*ordered)


def sessionize_stream(
    df: DataFrame,
    timestamp_col: str = "ts",
    entity_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization via ``session_window`` — merges events
    closer than ``gap`` into one session per entity; a session closes
    (and its state is evicted) once the watermark passes its end.

    Returns (user_id, session_start, session_end, n_events) —
    ``session_end`` is the window end, i.e. last event + gap, the
    session_window convention.
    """
    wm = df.withWatermark(timestamp_col, watermark)
    return (
        wm.groupBy(
            F.col(f"`{entity_col}`"),
            F.session_window(F.col(f"`{timestamp_col}`"), gap),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            f"`{entity_col}`",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    timestamp_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: drop replays
    of ``key_cols`` seen within the watermark horizon.
    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    evicts it when the watermark passes — bounded state, unlike plain
    ``dropDuplicates`` on a stream, whose state grows forever unless
    the event-time column is part of the key."""
    return df.withWatermark(timestamp_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_to_memory(
    stream_df: DataFrame, mode: str = "append", name: str | None = None
) -> DataFrame:
    """Drain a (bounded) stream into a memory sink with
    ``trigger(availableNow=True)`` and return the result table.

    ``availableNow`` processes the existing backlog and terminates —
    the deterministic harness for validating streaming semantics
    against batch twins. NOTE append-mode windowed aggregations only
    emit windows the watermark has passed; a bounded replay therefore
    withholds the tail windows. Use ``mode="complete"`` when the full
    result is required (tests), append for incremental sinks.
    """
    name = name or f"stream_{uuid.uuid4().hex[:10]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
