"""Fuzzy (edit-distance) self-join: all pairs within Levenshtein
``max_dist``, without the all-pairs cross product.

Two layers: the Ed-Join candidate machinery runs over DISTINCT
strings (each edit distance computed once, identical strings never
reach Levenshtein at all), and id-level pairs are re-expanded from
string pairs by equi-joins — so duplicate-heavy entity columns (the
common case) pay verification proportional to distinct values and
pay the duplicate multiplicity only in the output rows themselves.

Candidate generation is Ed-Join prefix filtering (Xiao, Wang & Lin,
VLDB'08): each string's distinct q-grams are ordered by global rarity
(corpus frequency asc, gram asc) and only the first
``max_dist·q + 1`` participate in the candidate equi-join. Lossless
(symmetric prefix-prefix): if the two prefixes are disjoint then —
taking the larger of the two prefix maxima in the global order — one
string has ``max_dist·q + 1`` gram types absent from the other
entirely, and a single edit can destroy at most ``q`` gram types, so
the distance exceeds ``max_dist``.

The count bound is vacuous when the longer string has ≤
``max_dist·q`` grams, i.e. length < ``(max_dist+1)·q`` — e.g.
("axa", "aya") at q=2, k=1 share ZERO bigrams at distance 1. ALL
strings below that length therefore go to an explicit exhaustive
short bucket (constant-sized in any real corpus; a corpus of mostly
such strings degrades to the quadratic it actually requires).

Plan shape (the part that matters at scale): strings ride along with
their prefix grams, so the candidate join VERIFIES inline —
length gap, then JVM ``levenshtein`` — and the only distinct runs on
true result pairs, never on the (much larger) candidate multiset.
One gram-frequency aggregate (vocabulary-sized), one rarity-ranking
window (bounded by grams-per-string), one equi-join on the gram key,
zero joins after it. Carrying the string through the join is the
right trade for name/title-length strings (edit distance is
meaningless on document-length text anyway); candidate rows are
bounded by Σ per-gram prefix-occurrence², which the rarity ordering
keeps cold ("Customer#", "the " never make a prefix).
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
    """All (id_a < id_b) pairs with levenshtein ≤ ``max_dist``, exact.

    Runs the Ed-Join over DISTINCT strings, then expands string pairs
    back to id pairs with equi-joins. Exact duplicates are rampant in
    real entity columns (and in the sf1 replica soak, where every name
    occurs 10×): with m copies per string, the naive id-level join
    computes the same Levenshtein m² times and the r3 soak measured
    it super-linear. Distinct-level verification computes each
    distance ONCE; the m² blow-up survives only in the output
    expansion (those rows ARE the answer) as pure equi-joins, and
    identical-string pairs (dist 0) skip Levenshtein entirely.
    """
    ids = df.select(
        F.col(f"`{id_col}`").alias("id"),
        F.col(f"`{str_col}`").alias("s"),
    )
    spairs = _distinct_string_pairs(
        ids.select("s").distinct(), max_dist, q
    )
    a = ids.select(F.col("id").alias("raw_a"), F.col("s").alias("s_a"))
    b = ids.select(F.col("id").alias("raw_b"), F.col("s").alias("s_b"))
    # cross-string expansion: the two id sets are disjoint (strings
    # differ), so least/greatest emits each unordered pair exactly once
    cross = (
        spairs.join(a, "s_a")
        .join(b, "s_b")
        .select(
            F.least("raw_a", "raw_b").alias("id_a"),
            F.greatest("raw_a", "raw_b").alias("id_b"),
            "dist",
        )
    )
    # identical-string pairs: distance 0 by definition — one equi-join
    # on the string, no edit-distance evaluation
    same = (
        a.join(b, F.col("s_a") == F.col("s_b"))
        .where(F.col("raw_a") < F.col("raw_b"))
        .select(
            F.col("raw_a").alias("id_a"),
            F.col("raw_b").alias("id_b"),
            F.lit(0).cast("bigint").alias("dist"),
        )
    )
    return cross.unionByName(same)


def _distinct_string_pairs(
    strs: DataFrame, max_dist: int, q: int
) -> DataFrame:
    """Ed-Join proper over a DISTINCT string set: (s_a < s_b, dist ≤
    max_dist). One Levenshtein per candidate string pair."""
    prefix_len = max_dist * q + 1
    s = strs.select(F.col("s").alias("id"), F.col("s").alias("s"))
    grams = s.select(
        "id", "s", F.explode(F.expr(_gram_expr("s", q))).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("id").orderBy("freq", "g")
    prefix = (
        grams.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("id", "s", "g")
    )
    # CPU-quadratic boundary: the gram join's OUTPUT is quadratic in
    # hot buckets while its INPUT is a few MB, so AQE's byte-based
    # coalescing would serialize it onto one task (measured 16× on the
    # customer names). Explicit numPartitions pins the width — AQE
    # honors user-specified repartition counts. Same guard as the
    # n-gram Jaccard candidate join (dedup._pinned_partitions).
    from .dedup import _pinned_partitions

    prefix = prefix.repartition(_pinned_partitions(strs), F.col("g"))
    cand = (
        prefix.select(
            F.col("id").alias("id_a"), F.col("s").alias("s_a"), "g"
        )
        .join(
            prefix.select(
                F.col("id").alias("id_b"), F.col("s").alias("s_b"), "g"
            ),
            "g",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
    )
    # strings too short for the count bound (longer side would have
    # ≤ max_dist·q grams): pair the short block exhaustively
    short = s.where(F.length("s") < (max_dist + 1) * q).select(
        "id", "s", F.lit(1).alias("_b")
    )
    short_pairs = (
        short.select(
            F.col("id").alias("id_a"), F.col("s").alias("s_a"), "_b"
        )
        .join(
            short.select(
                F.col("id").alias("id_b"), F.col("s").alias("s_b"), "_b"
            ),
            "_b",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
    )
    return (
        cand.unionByName(short_pairs)
        .where(F.abs(F.length("s_a") - F.length("s_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .where(F.col("dist") <= max_dist)
        .select("s_a", "s_b", F.col("dist").cast("bigint").alias("dist"))
        .distinct()
    )


def edit_distance_string_pairs(
    strings: DataFrame, max_dist: int = 2, q: int = 2
) -> DataFrame:
    """Public string-LEVEL Ed-Join: (s_a < s_b, dist ≤ max_dist) over
    a one-column ``s`` DataFrame of distinct strings.

    This is the right entry point when the caller's unit of identity
    is the string (entity-resolution GROUPS, vocabulary dedup), not
    the row: :func:`edit_distance_pairs`'s id-level expansion is the
    answer when the pairs themselves are wanted, but it multiplies
    every string pair by m_a·m_b row copies — quadratic in duplicate
    multiplicity, which the sf10 soak measured blowing up the
    entity-resolution pipeline (group-level rework, round 6). At the
    string level the output is bounded by distinct-string pair
    cardinality, independent of how many rows share a name."""
    return _distinct_string_pairs(strings.select("s").distinct(), max_dist, q)
