"""Exact order statistics at 100 TB without a global sort.

Spark's exact ``percentile`` aggregate collects every value of a group
into one executor's memory — for a GLOBAL quantile over a 100 TB fact
table that is a single-task sort/OOM, and ``approx_percentile`` trades
the exactness away. The classical distributed answer is radix
quickselect: treat the 64-bit value as four 16-bit digits and walk
them most-significant first. Each level runs ONE map-only histogram
aggregate over the rows still matching the chosen digit prefix (a
≤65,536-cell count vector — bounded driver state), the driver picks
the digit cell containing the target rank and descends. Four levels
pin the exact value of ANY rank — median, p99, p99.999 — with zero
shuffles of data rows, zero sorts, and per-pass state independent of
N. Multiple ranks share each pass (their digit histograms come out of
one scan, side by side).

Signedness: a digit prefix is tracked as the value of the arithmetic
shift ``v >> shift`` — for two's-complement longs,
``v >> (s+16) * 2^16 + ((v >> s) & 0xFFFF) == v >> s`` exactly, so
the prefix composes by ``prefix·2^16 + digit`` and signed digit order
equals value order at every level (level-0 digits carry the sign
bits; lower digits are pure magnitude compared within a fixed higher
prefix). After the last level the prefix IS the value.

Ranks are 1-indexed lower order statistics (``k = ceil(q·n)``), the
same contract as the DuckDB window-rank oracle the workload query
hash-matches.

The cost is ≤4 passes of the single value column (column-pruned;
with a zone-mapped / Z-ordered layout the level-1..3 prefix
predicates also prune files). That is the honest trade against one
full shuffle-sort of the table — at 100 TB, four column scans beat a
terabyte-scale range-partitioned sort and never risk a skewed
reducer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIGIT_BITS = 16
_LEVELS = 4
_MASK = (1 << _DIGIT_BITS) - 1


def exact_quantiles_radix(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """Exact lower-order-statistic quantiles (``k = ceil(q·n)``,
    1-indexed over non-NULL values) of a LONG column, by four
    bounded-memory histogram passes (module doc). Returns a DataFrame
    (quantile, value) — one row per requested quantile, NULL value
    when the input has no non-NULL rows."""
    for q in quantiles:
        if not 0 < q <= 1:
            raise ValueError("quantiles must be in (0, 1]")
    v = df.select(F.col(f"`{value_col}`").cast("long").alias("v")).where(
        F.col("v").isNotNull()
    )
    n = v.count()
    if n == 0:
        return spark.createDataFrame(
            [(float(q), None) for q in quantiles],
            "quantile double, value long",
        )
    # per-quantile state: remaining 1-indexed rank within the current
    # prefix group, and the arithmetic-shift prefix fixed so far
    state = [
        {"k": max(1, math.ceil(q * n - 1e-9)), "prefix": 0}
        for q in quantiles
    ]
    for level in range(_LEVELS):
        shift = _DIGIT_BITS * (_LEVELS - 1 - level)
        digit_cols = []
        for s in state:
            if level == 0:
                # sign-carrying top digit: arithmetic shift, no mask
                digit_cols.append(F.shiftright(F.col("v"), shift))
            else:
                prev_shift = shift + _DIGIT_BITS
                cond = F.shiftright(F.col("v"), prev_shift) == F.lit(
                    s["prefix"]
                )
                digit = F.shiftright(F.col("v"), shift).bitwiseAND(
                    F.lit(_MASK)
                )
                digit_cols.append(F.when(cond, digit))
        hist = (
            v.select(F.posexplode(F.array(*digit_cols)).alias("qi", "digit"))
            .where(F.col("digit").isNotNull())
            .groupBy("qi", "digit")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        per_q: dict[int, list] = {}
        for r in hist:
            per_q.setdefault(r["qi"], []).append((r["digit"], r["cnt"]))
        for qi, s in enumerate(state):
            cum = 0
            for digit, cnt in sorted(per_q.get(qi, [])):
                if cum + cnt >= s["k"]:
                    s["k"] -= cum
                    s["prefix"] = s["prefix"] * (_MASK + 1) + int(digit)
                    break
                cum += cnt
    return spark.createDataFrame(
        [(float(q), s["prefix"]) for q, s in zip(quantiles, state)],
        "quantile double, value long",
    )


def exact_weighted_quantiles_radix(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    weight_col: str,
    quantiles: list[float],
) -> DataFrame:
    """Weighted lower order statistics — the smallest value v whose
    cumulative weight reaches ``ceil(q·W)`` (1-indexed over total
    weight W) — by the same four bounded histogram passes as
    :func:`exact_quantiles_radix`, summing WEIGHTS per digit instead
    of counting rows. The corpus-planning question ("the
    token-weighted median document length") at any N, exact, no
    sort. Rows with NULL or non-positive weight carry no rank and
    are excluded."""
    for q in quantiles:
        if not 0 < q <= 1:
            raise ValueError("quantiles must be in (0, 1]")
    v = df.select(
        F.col(f"`{value_col}`").cast("long").alias("v"),
        F.col(f"`{weight_col}`").cast("long").alias("w"),
    ).where(F.col("v").isNotNull() & (F.col("w") > 0))
    total = v.agg(F.sum("w")).first()[0]
    if not total:
        return spark.createDataFrame(
            [(float(q), None) for q in quantiles],
            "quantile double, value long",
        )
    state = [
        {"k": max(1, math.ceil(q * total - 1e-9)), "prefix": 0}
        for q in quantiles
    ]
    for level in range(_LEVELS):
        shift = _DIGIT_BITS * (_LEVELS - 1 - level)
        digit_cols = []
        for s in state:
            if level == 0:
                digit_cols.append(F.shiftright(F.col("v"), shift))
            else:
                prev_shift = shift + _DIGIT_BITS
                cond = F.shiftright(F.col("v"), prev_shift) == F.lit(
                    s["prefix"]
                )
                digit = F.shiftright(F.col("v"), shift).bitwiseAND(
                    F.lit(_MASK)
                )
                digit_cols.append(F.when(cond, digit))
        hist = (
            v.select(
                "w", F.posexplode(F.array(*digit_cols)).alias("qi", "digit")
            )
            .where(F.col("digit").isNotNull())
            .groupBy("qi", "digit")
            .agg(F.sum("w").alias("cnt"))
            .collect()
        )
        per_q: dict[int, list] = {}
        for r in hist:
            per_q.setdefault(r["qi"], []).append((r["digit"], r["cnt"]))
        for qi, s in enumerate(state):
            cum = 0
            for digit, cnt in sorted(per_q.get(qi, [])):
                if cum + cnt >= s["k"]:
                    s["k"] -= cum
                    s["prefix"] = s["prefix"] * (_MASK + 1) + int(digit)
                    break
                cum += cnt
    return spark.createDataFrame(
        [(float(q), s["prefix"]) for q, s in zip(quantiles, state)],
        "quantile double, value long",
    )


def equidepth_buckets(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """Equi-depth (quantile) binning at any N without a sort: the
    ``n_buckets − 1`` interior cut points come from
    :func:`exact_quantiles_radix` (four bounded histogram passes, all
    cut points sharing each pass), then every row is labeled by ONE
    map-only pass counting cut points strictly below its value — ties
    at a cut point land in the lower bucket, the deterministic
    convention the oracle mirrors. Returns the per-bucket summary
    (bucket, n_rows, min_v, max_v); the labeling expression is reusable
    for ML feature bucketization. Unlike ``ntile`` this never
    shuffles rows — the only data-sized work is map-side."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = [
        r["value"]
        for r in exact_quantiles_radix(spark, df, value_col, qs)
        .orderBy("quantile")
        .collect()
    ]
    if any(c is None for c in cuts):
        # empty or all-NULL input: exact_quantiles_radix returns NULL
        # cut values — mirror its graceful contract with an empty
        # summary instead of raising on int(None) (ADVICE r5)
        return spark.createDataFrame(
            [], "bucket int, n_rows bigint, min_v long, max_v long"
        )
    v = F.col(f"`{value_col}`").cast("long")
    cut_arr = F.array(*[F.lit(int(c)).cast("long") for c in cuts])
    bucket = F.aggregate(
        cut_arr,
        F.lit(0),
        lambda acc, c: acc + F.when(c < v, 1).otherwise(0),
    )
    return (
        df.where(v.isNotNull())
        .select(v.alias("_v"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
        .orderBy("bucket")
    )
