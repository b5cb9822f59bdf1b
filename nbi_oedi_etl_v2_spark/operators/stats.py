"""Single-pass multivariate statistics.

``correlation_matrix`` computes Pearson r for EVERY pair of p numeric
columns from one map-side-combined hash aggregate — n, p first
moments, p(p+1)/2 second moments — then assembles the p×p upper
triangle driver-free with the same explode-unpivot used by the DQ
suite. Moments are exact ``DECIMAL(38,10)`` sums (the engine's
hash-oracle convention), so the closed-form r is bit-identical across
engines; at 100 TB the scan is one pass and the shuffle carries
p(p+3)/2 + 1 numbers per partition, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dsum


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_a, col_b, corr) for every unordered pair of ``cols``
    (lexicographic a < b), Pearson r rounded to 7, NULL when either
    variance is zero."""
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(dsum(F.col(c)).alias(f"s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(sorted(cols))
        for b in sorted(cols)[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(dsum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    wide = df.agg(*aggs)
    n = F.col("n")

    def corr(a: str, b: str):
        cov_n = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        var_a = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        var_b = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return F.when(
            (var_a > 0) & (var_b > 0),
            F.round(cov_n / (F.sqrt(var_a) * F.sqrt(var_b)), 7),
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr(a, b).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return (
        wide.select(F.explode(rows).alias("_r"))
        .select("_r.col_a", "_r.col_b", "_r.corr")
        .orderBy("col_a", "col_b")
    )


def correlation_matrix_oracle_sql(
    cols: list[str], source: str = "lineitem"
) -> str:
    """DuckDB twin mirroring the exact-decimal moment arithmetic."""
    from ..functions import dsum_sql

    cs = sorted(cols)
    moments = ["CAST(count(*) AS DOUBLE) AS n"]
    for c in cs:
        moments.append(f"{dsum_sql(c)} AS s_{c}")
        moments.append(f"{dsum_sql(f'{c} * {c}')} AS ss_{c}")
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i + 1 :]]
    for a, b in pairs:
        moments.append(f"{dsum_sql(f'{a} * {b}')} AS sp_{a}_{b}")
    selects = []
    for a, b in pairs:
        cov = f"(n * sp_{a}_{b} - s_{a} * s_{b})"
        va = f"(n * ss_{a} - s_{a} * s_{a})"
        vb = f"(n * ss_{b} - s_{b} * s_{b})"
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
            f" CASE WHEN {va} > 0 AND {vb} > 0 THEN"
            f" round({cov} / (sqrt({va}) * sqrt({vb})), 7) END AS corr"
            f" FROM m"
        )
    body = "\n      UNION ALL\n      ".join(selects)
    return (
        f"WITH m AS (SELECT {', '.join(moments)} FROM {source})\n"
        f"    SELECT * FROM (\n      {body}\n    ) ORDER BY col_a, col_b"
    )


def sampled_sum_estimate(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str],
    denom: int = 10,
    seed: int = 77,
) -> DataFrame:
    """Approximate-query-processing SUM: a deterministic 1/``denom``
    hash sample (xxhash64 of the row key — reproducible, no RNG
    state, pushes down as a cheap predicate) scaled by the
    Horvitz-Thompson estimator, with a per-group variance estimate
    ``Var ≈ ((1−p)/p²)·Σ_sample x²`` for CLT error bars. Returns
    (group…, n_sampled, est_sum, ci_half_3sigma). At 100 TB this
    reads 1/denom of the data and answers within ±3σ — the
    exploratory-dashboard trade; the workload query pins the
    estimate inside its own interval against the exact twin."""
    p = 1.0 / denom
    sampled = df.where(
        F.pmod(F.xxhash64(F.col(f"`{key_col}`"), F.lit(seed)), denom) == 0
    )
    x = F.col(f"`{value_col}`")
    return sampled.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        (F.sum(x.cast("decimal(38,10)")).cast("double") / F.lit(p)).alias(
            "est_sum"
        ),
        (
            F.lit(3.0)
            * F.sqrt(
                F.lit((1 - p) / (p * p))
                * F.sum((x * x).cast("decimal(38,10)")).cast("double")
            )
        ).alias("ci_half_3sigma"),
    )
