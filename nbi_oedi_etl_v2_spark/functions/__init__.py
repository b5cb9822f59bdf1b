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

# 15 integer digits / 10 fractional — fits sums of ~1e5-magnitude
# measures over billions of rows without overflow at sf0.1; on a real
# 100 TB run widen to DECIMAL(38,10).
SUM_DECIMAL = "decimal(25,10)"


def dsum(expr: Column) -> Column:
    """Order-insensitive exact sum of a double expression → double."""
    return F.sum(expr.cast(SUM_DECIMAL)).cast("double")


def davg(expr: Column) -> Column:
    """Order-insensitive mean of a double expression → double."""
    return F.sum(expr.cast(SUM_DECIMAL)).cast("double") / F.count(expr)


def davg_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`davg` exactly."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,10))) AS DOUBLE) / COUNT({expr})"
    )


def dsum_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`dsum` exactly."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,10))) AS DOUBLE)"
