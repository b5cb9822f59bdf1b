"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (on by default in this engine's sessions)
handles skewed *sort-merge joins* at runtime. Two hot-key cases remain
where explicit salting is the right tool at 100 TB:

- **Skewed aggregation**: one giant group key (null ids, empty
  strings, bot traffic) lands every row on one reducer. Salting splits
  each group into ``n`` sub-groups (extra key = deterministic hash of
  a spread column mod n), combines partials per sub-group, then
  re-aggregates the ``n`` partials per real group — the second stage
  shuffles only #groups × n rows.
- **Skewed shuffled join**: a hot fact key overwhelms its reducer and
  the dim side is too big to broadcast whole. Replicate each dim row
  ``n`` times (one per salt), salt the fact side by hash mod n, and
  join on (key, salt): the hot key spreads over n tasks at the cost of
  n× the dim shuffle — bounded and chosen, instead of unbounded and
  accidental.

Both transformations are semantics-preserving for any salt assignment;
tests assert equality against the unsalted formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate functions that decompose into partial + final combine
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    spread_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column → (function, input column) with
    function ∈ {sum, count, min, max} (the decomposable set; avg =
    sum/count composed by the caller). ``spread_col`` seeds the salt —
    any column with per-row variation (defaults to the first non-key
    column); the salt must NOT depend on the group key alone, or hot
    groups stay unsplit.
    """
    for fn, _ in aggs.values():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{fn!r} is not decomposable; use sum/count/min/max")
    spread = spread_col or next(c for c in df.columns if c not in keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(f"`{spread}`")), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*[F.col(f"`{k}`") for k in keys], F.col("__salt")).agg(
        *[
            _DECOMPOSABLE[fn][0](F.col(f"`{src}`")).alias(f"__p_{out}")
            for out, (fn, src) in aggs.items()
        ]
    )
    return partial.groupBy(*[F.col(f"`{k}`") for k in keys]).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"__p_{out}")).alias(out)
            for out, (fn, src) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated ×``salt_buckets`` and the
    fact side salted deterministically, so a hot key spreads over
    ``salt_buckets`` reducers. Output columns = fact ∪ dim minus the
    duplicate key, as with a plain ``join(..., on=key)``.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported:
    the dim side is replicated, so a right/full outer join would emit
    every unmatched dim row ``salt_buckets`` times — silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated dim side duplicates unmatched rows under "
            "right/full outer semantics"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    dim_rep = dim.withColumn("__salt", salts)
    fact_s = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    joined = fact_s.join(
        dim_rep,
        (fact_s[f"`{fact_key}`"] == dim_rep[f"`{dim_key}`"])
        & (fact_s["__salt"] == dim_rep["__salt"]),
        how,
    )
    keep = [fact_s[f"`{c}`"] for c in fact.columns] + [
        dim_rep[f"`{c}`"] for c in dim.columns if c != dim_key
    ]
    return joined.select(*keep)
