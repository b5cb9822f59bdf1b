"""Fuzzy (edit-distance) self-join: all pairs within Levenshtein
``max_dist``, without the all-pairs cross product.

Candidate generation is Ed-Join-style q-gram prefix filtering
(Xiao et al., VLDB'08): each string's distinct q-grams are ordered by
global rarity (corpus frequency asc, gram asc) and only the first
``max_dist·q + 1`` participate in the candidate equi-join. Lossless:
one edit can destroy at most ``q`` gram types, so two strings within
``max_dist`` edits cannot have disjoint prefixes of that length.
Strings too short to yield a q-gram are handled by an explicit short
bucket (a string of length < q can only be within ``max_dist`` of
strings of length < q + max_dist — a constant-size block in any real
corpus; documented skew caveat if your corpus is all 1-char strings).

Scale shape: one gram-frequency aggregate (vocabulary-sized), one
rarity-ranked window per string (bounded by grams-per-string), one
equi-join on gram hash, then the Levenshtein verify ONLY on surviving
candidates (JVM built-in, never per-row Python). The same
prefix-filter trick the exact n-gram Jaccard join uses
(operators/dedup.py) — rarity ordering keeps hot grams ("the ",
"Customer#") out of every prefix, which is what bounds the candidate
count on skewed text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_expr(s: str, q: int) -> str:
    # guard: sequence(1, 0) would produce [1, 0] (auto-negative step)
    return (
        f"CASE WHEN length({s}) >= {q} THEN "
        f"array_distinct(transform(sequence(1, length({s}) - {q - 1}), "
        f"i -> substring({s}, i, {q}))) ELSE array() END"
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (id_a < id_b) pairs with levenshtein ≤ ``max_dist``,
    exact — the prefix filter only prunes, never loses a pair."""
    prefix_len = max_dist * q + 1
    s = df.select(
        F.col(f"`{id_col}`").alias("id"),
        F.col(f"`{str_col}`").alias("s"),
    )
    grams = s.select(
        "id", F.explode(F.expr(_gram_expr("s", q))).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("id").orderBy("freq", "g")
    prefix = (
        grams.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("id", "g")
    )
    cand = (
        prefix.select(F.col("id").alias("id_a"), "g")
        .join(prefix.select(F.col("id").alias("id_b"), "g"), "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # strings with no q-gram: pair the short block exhaustively
    short = s.where(F.length("s") < q + max_dist).select(
        F.col("id"), F.lit(1).alias("_b")
    )
    short_pairs = (
        short.select(F.col("id").alias("id_a"), "_b")
        .join(short.select(F.col("id").alias("id_b"), "_b"), "_b")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    all_cand = cand.unionByName(short_pairs).distinct()
    sa = s.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = s.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        all_cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            F.abs(F.length("s_a") - F.length("s_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("bigint").alias("dist"))
    )
