"""Bounded-memory heavy hitters: Misra-Gries candidates + exact verify.

The naive φ-heavy-hitter query (``GROUP BY key HAVING count ≥ φ·N``)
hash-aggregates EVERY distinct key — at 100 TB with a high-cardinality
key (URLs, n-grams, user agents) that is a shuffle of the full key
space to find a handful of rows. The classic streaming answer is the
Misra-Gries summary: ``k = ⌈1/φ⌉`` counters, decrement-all on
overflow, with the guarantee that any key whose frequency exceeds
``n/(k+1)`` survives the summary.

Distributed formulation (candidates + exact verify — the same
superset-then-verify shape as the dedup family):

1. **Candidates**: each Arrow batch runs Misra-Gries locally
   (``mapInPandas``, O(k) state, zero shuffle). Pigeonhole: a key with
   global count ≥ φ·N has count ≥ φ·n_b in at least one batch b, and
   MG with ⌈1/φ⌉ counters never evicts a key above that bar — so the
   union of batch summaries is a SUPERSET of the true heavy hitters.
   The union is ≤ k·#batches keys, orders of magnitude smaller than
   the key space.
2. **Verify**: one exact count restricted to candidate keys (semi-join
   → hash agg over the shrunk key set), filtered against the exact
   global total (broadcast scalar, never collected). Output is EXACT —
   the summary only chooses what to count, never what to report — and
   deterministic under any partitioning, row order, or batch split,
   because every true heavy hitter is counted exactly and every
   reported key passed the exact bar.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries(values: Iterator, k: int) -> dict:
    """Textbook MG summary with k counters (decrement-all overflow)."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitter_candidates(
    df: DataFrame, key_col: str, phi: float
) -> DataFrame:
    """Distinct candidate keys from per-batch Misra-Gries summaries —
    a guaranteed superset of the φ-heavy hitters (see module doc).
    Arrow-batched, O(⌈1/φ⌉) state per batch, no shuffle until the
    final distinct."""
    if not 0 < phi < 1:
        raise ValueError("phi must be in (0, 1)")
    k = math.ceil(1.0 / phi)
    keyed = df.select(F.col(f"`{key_col}`").alias("key"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters = _misra_gries(iter(pdf["key"]), k)
            yield pd.DataFrame({"key": list(counters.keys())})

    cand = keyed.mapInPandas(summarize, schema=keyed.schema)
    return cand.distinct()


def heavy_hitters(
    df: DataFrame, key_col: str, phi: float
) -> DataFrame:
    """EXACT φ-heavy hitters (count ≥ φ·N) at bounded memory:
    MG candidates, then one exact count over candidate keys only.
    Returns (key, cnt, share) — deterministic, engine-portable, and
    identical to the full ``GROUP BY key HAVING`` answer, which is
    exactly what the DuckDB oracle runs."""
    keyed = df.select(F.col(f"`{key_col}`").alias("key"))
    cand = heavy_hitter_candidates(df, key_col, phi)
    counted = (
        keyed.join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(phi) * F.col("_total"))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 7).alias("share"),
        )
    )
