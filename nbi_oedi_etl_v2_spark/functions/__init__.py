"""Column-expression helpers shared across operators and workload queries.

Float-parity strategy (SURVEY §7 risk 1): a plain ``SUM(double)``
differs between Spark and any oracle because partial-aggregation order
differs. Every aggregate the correctness harness hashes therefore sums
an exact ``DECIMAL`` cast of the (deterministically computed) double
expression, then casts the exact result back to double. Identical
inputs → bit-identical outputs on both engines, at ~zero cost (decimal
sum is still a JVM codegen'd aggregate; no UDFs involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 28 integer digits / 10 fractional — fits sums of ~1e5-magnitude
# measures over ~1e23 rows; headroom for any 100 TB run. Spark backs
# precision >18 with BigDecimal either way, so the width is free.
SUM_DECIMAL = "decimal(38,10)"


def dsum(expr: Column) -> Column:
    """Order-insensitive exact sum of a double expression → double."""
    return F.sum(expr.cast(SUM_DECIMAL)).cast("double")


def davg(expr: Column) -> Column:
    """Order-insensitive mean of a double expression → double."""
    return F.sum(expr.cast(SUM_DECIMAL)).cast("double") / F.count(expr)


# DuckDB's direct DECIMAL→DOUBLE cast divides the int128 payload by
# 10^scale in floating point and is NOT always correctly rounded
# (e.g. 3758439620.06 arrives as …0.0600004), while Spark's
# (BigDecimal.doubleValue) is. Routing through VARCHAR forces DuckDB's
# correctly-rounded string→double parser, so both engines emit the
# nearest double to the same exact decimal.


def davg_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`davg` exactly."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def dsum_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`dsum` exactly."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
