"""Deduplication operator family (north-star extension, SURVEY §2.11
Ext / §7 phase 5): exact, MinHash+LSH, SimHash, and n-gram-Jaccard
near-duplicate detection over a text corpus.

All hot-path logic is JVM-side column expressions (higher-order
functions over arrays + xxhash64) — no Python UDFs — so every variant
whole-stage-codegens and scales by shuffle volume only.

Scale design (100 TB corpus):
- exact dedup is one hash aggregate on the content key (map-side
  partial dedup shrinks the shuffle to distinct keys per partition);
- MinHash/LSH and SimHash avoid O(n²): candidates come from an
  equi-join on (band_id, band_hash) / (block_id, block_bits) — the
  only shuffle is hash-partitioned on band signatures, and only
  near-identical docs collide;
- n-gram Jaccard joins on individual shingles — exact but
  shuffle-heavy (|doc|×shingles rows); it is the small-scale oracle
  twin against which the sketch variants are validated;
- hot shingles/bands (boilerplate) skew the join — AQE skew-join
  handles moderate skew; extreme boilerplate should be stop-shingled
  upstream (drop shingles with document frequency > threshold, which
  is itself one aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(text_col: str, k: int = 5, lowercase: bool = True) -> F.Column:
    """Distinct character k-shingles of a string column, as an array.

    Pure codegen: substring over a position sequence. Empty/short
    strings yield an empty array.
    """
    src = f"lower(`{text_col}`)" if lowercase else f"`{text_col}`"
    return F.expr(
        f"CASE WHEN length({src}) < {k} THEN array({src}) "
        f"ELSE array_distinct(transform(sequence(1, length({src}) - {k} + 1), "
        f"i -> substring({src}, i, {k}))) END"
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact deduplication: one representative (min id) per distinct
    key, plus the duplicate count.

    ``dropDuplicates`` keeps an *arbitrary* row — fine for pipelines,
    useless for deterministic comparison; min-id selection makes the
    representative stable across engines and runs.
    """
    return (
        df.groupBy(*[F.col(f"`{c}`") for c in key_cols])
        .agg(
            F.min(F.col(f"`{id_col}`")).alias(f"{id_col}"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    shingle → explode → self-equi-join on shingle → per-pair overlap
    count → |A∩B| / (|A|+|B|-|A∩B|). Exact but O(Σ shingle-pairs);
    the MinHash variant is the 100 TB path, this is its ground truth.
    """
    sh = df.select(
        F.col(f"`{id_col}`").alias("doc"),
        char_shingles(text_col, k).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))

    exploded = sh.select("doc", "n_shingles", F.explode("shingles").alias("shingle"))
    a = exploded.select(
        F.col("doc").alias("id_a"), F.col("n_shingles").alias("n_a"), "shingle"
    )
    b = exploded.select(
        F.col("doc").alias("id_b"), F.col("n_shingles").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    jac = F.col("overlap").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("overlap")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(jac, 7))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, num_hashes: int = 64
) -> DataFrame:
    """(id, shingles, sig: array<bigint>) — sig[i] = min over shingles
    of xxhash64(shingle, i). xxhash64's extra argument acts as the
    per-function seed, so no hash-family bookkeeping is needed."""
    return df.select(
        F.col(f"`{id_col}`").alias("doc"),
        char_shingles(text_col, k).alias("shingles"),
    ).withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"h -> array_min(transform(shingles, s -> xxhash64(s, h))))"
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact
    Jaccard on the shingle sets of candidate pairs only.

    b=16 bands × r=4 rows ≈ s-curve midpoint (1/b)^(1/r) ≈ 0.5 —
    recall ≈ 1 at jaccard ≥ 0.8. The band join is the only shuffle
    that grows with corpus size; verification touches candidates only.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)

    # The banded rows carry ONLY (doc, band, bhash) — never the
    # shingle arrays. Exploding ×bands with the array attached would
    # multiply shuffle bytes by the band count; instead the (big)
    # shingle sets are re-attached to the few surviving candidate
    # pairs afterwards. At 100 TB this is the difference between
    # shuffling 16× the corpus and shuffling 16 longs per doc.
    banded = sigs.select(
        "doc",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, xxhash64(slice(sig, b * {rows} + 1, {rows})) AS bhash))"
            )
        ).alias("band"),
    ).select("doc", "band.band", "band.bhash")

    a = banded.select(F.col("doc").alias("id_a"), "band", "bhash")
    b = banded.select(F.col("doc").alias("id_b"), "band", "bhash")
    candidates = (
        a.join(b, ["band", "bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    shingle_sets = sigs.select("doc", "shingles")
    pairs = (
        candidates.join(
            shingle_sets.select(F.col("doc").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            shingle_sets.select(F.col("doc").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), 7)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sum +1/-1 across
    token hashes, then take the sign. One row-local fold — no shuffle
    at all for signature computation."""
    tokens = f"regexp_extract_all(lower(`{text_col}`), '[a-z0-9]+', 0)"
    counters = (
        f"aggregate({tokens}, "
        f"array_repeat(0L, 64), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, 63), "
        f"b -> CASE WHEN (shiftright(xxhash64(t), b) & 1) = 1 THEN 1L ELSE -1L END), "
        f"(x, y) -> x + y))"
    )
    bits_to_long = (
        f"aggregate(zip_with({counters}, sequence(0, 63), "
        f"(c, b) -> CASE WHEN c >= 0 THEN shiftleft(1L, b) ELSE 0L END), "
        f"0L, (acc, v) -> acc | v)"
    )
    return df.select(
        F.col(f"`{id_col}`").alias("doc"), F.expr(bits_to_long).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: block the 64-bit signature into
    ``max_hamming + 1`` chunks (pigeonhole: any pair within the
    Hamming radius agrees on ≥1 whole block), equi-join per block,
    verify with exact popcount on xor."""
    blocks = max_hamming + 1
    width = 64 // blocks
    sh = simhash(df, id_col, text_col)
    blocked = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {blocks - 1}), "
                f"b -> struct(b AS blk, "
                f"(shiftright(simhash, b * {width}) & {(1 << width) - 1}) AS bits))"
            )
        ).alias("blk"),
    ).select("doc", "simhash", "blk.blk", "blk.bits")

    a = blocked.select(F.col("doc").alias("id_a"), F.col("simhash").alias("h_a"), "blk", "bits")
    b = blocked.select(F.col("doc").alias("id_b"), F.col("simhash").alias("h_b"), "blk", "bits")
    return (
        a.join(b, ["blk", "bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
