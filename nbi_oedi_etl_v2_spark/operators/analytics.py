"""Event-sequence analytics over the events stream table: funnel
progression and cohort retention — the standard product-analytics
rollups a clickstream warehouse runs daily, expressed as pure
DataFrame aggregates.

Scale shape:
- ``funnel``: one conditional aggregate per step, each a hash agg on
  the user key; step i joins step i−1's (user, t_{i-1}) — equi-joins
  on the same key Spark already shuffled on, so AQE plans them
  locally. The step chain is length-#steps (a handful), never
  data-dependent. Nothing collects.
- ``cohort_retention``: first-activity week per user (one agg), the
  distinct (user, week) activity grid (one agg), one join, one final
  count-distinct rollup. All shuffles key on user or the
  (cohort, offset) pair — bounded by user count, not event count,
  after the first partial-aggregated pass.

Engine portability: week flooring is ``date_trunc('week', ...)``
(ISO Monday in both Spark and DuckDB with the session pinned UTC);
offsets are exact integer day arithmetic — no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel progression: a user reaches step i when an event
    of type ``steps[i]`` occurs strictly AFTER their step-i−1 time
    (first qualifying occurrence, the classic product-analytics
    semantics). Returns one row per step:
    (step_index, step, users, conversion) with conversion relative to
    step 1.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t, ty = (F.col(f"`{c}`") for c in (user_col, ts_col, type_col))
    reached = (
        events.where(ty == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(t).alias("t_prev"))
    )
    counts = [reached.agg(F.count(F.lit(1)).cast("bigint").alias("users"))]
    for step in steps[1:]:
        nxt = (
            events.where(ty == step)
            .select(u.alias("user"), t.alias("t_ev"))
            .join(reached, "user")
            .where(F.col("t_ev") > F.col("t_prev"))
            .groupBy("user")
            .agg(F.min("t_ev").alias("t_prev"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).cast("bigint").alias("users")))
        reached = nxt
    labeled = None
    for i, (step, cnt) in enumerate(zip(steps, counts)):
        row = cnt.select(
            F.lit(i + 1).cast("bigint").alias("step_index"),
            F.lit(step).alias("step"),
            "users",
        )
        labeled = row if labeled is None else labeled.unionByName(row)
    base = counts[0].select(F.col("users").alias("_base"))
    return labeled.join(F.broadcast(base)).select(
        "step_index",
        "step",
        "users",
        F.round(
            F.when(F.col("_base") == 0, F.lit(0.0)).otherwise(
                F.col("users").cast("double") / F.col("_base")
            ),
            7,
        ).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by
    first-activity week, counted in each subsequent activity week.
    Returns (cohort_week, week_offset, active_users).
    """
    u, t = F.col(f"`{user_col}`"), F.col(f"`{ts_col}`")
    weeks = events.select(
        u.alias("user"), F.date_trunc("week", t).alias("week")
    ).distinct()
    first = weeks.groupBy("user").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "user")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user").cast("bigint").alias("active_users"))
    )
