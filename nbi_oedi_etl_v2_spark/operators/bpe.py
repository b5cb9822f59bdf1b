"""Distributed byte-pair-encoding vocabulary learning.

The tokenizer-training step of an LLM data pipeline: learn the top-N
BPE merges from a corpus. The classical trainer insight carries over
to Spark unchanged — after the first aggregation the working set is
the DISTINCT-WORD table (word → symbol sequence, corpus count), which
is vocabulary-sized (power-law bounded, millions of rows at 100 TB,
not billions), so:

- one corpus-sized shuffle total (tokenize → word counts), up front;
- each merge step is (a) one explode + hash-aggregate of adjacent
  symbol pairs over the word table, weighted by word count, (b) a
  1-row TakeOrdered for the argmax pair — (count desc, pair asc),
  deterministic — and (c) a map-only pure-JVM ``aggregate`` fold
  rewriting each word's symbol array with the standard left-to-right
  non-overlapping greedy merge. No Python workers anywhere.
- the driver holds one best pair per step; the word table is
  ``localCheckpoint``ed each step so plan depth stays flat in N.

Merge semantics (pinned by both the pytest reference implementation
and the DuckDB oracle's delimiter-safe string replace): scanning left
to right, an (a, b) adjacency merges and scanning resumes AFTER the
merged token — so ``a a a`` with pair (a,a) yields ``aa a``, and
``a b a b`` with (a,b) yields ``ab ab``. Initial symbols are the
characters of each word (no end-of-word marker — documented contract,
identical on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKENIZE = "filter(split(lower(`{col}`), '[^a-z0-9]+'), x -> x <> '')"


def _merge_fold(a: str, b: str):
    """Pure-JVM left-to-right greedy pair merge of a symbol array:
    an ``aggregate`` fold carrying (out, pending)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc, x):
        take_pending = acc["pending"].isNotNull()
        is_merge = take_pending & (acc["pending"] == la) & (x == lb)
        return (
            F.when(
                ~take_pending,
                F.struct(acc["out"].alias("out"), x.alias("pending")),
            )
            .when(
                is_merge,
                F.struct(
                    F.concat(acc["out"], F.array(lab)).alias("out"),
                    F.lit(None).cast("string").alias("pending"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pending"])).alias(
                        "out"
                    ),
                    x.alias("pending"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )
    return lambda syms: F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["pending"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pending"]))),
    )


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms) distinct-word table — the trainer's working
    set; ``syms`` starts as the word's character array."""
    toks = F.expr(_TOKENIZE.format(col=text_col))
    return (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "syms", F.expr("filter(split(w, ''), x -> x <> '')")
        )
    )


def learn_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    num_merges: int = 8,
) -> DataFrame:
    """Learn the top-``num_merges`` BPE merges. Returns (step, left,
    right, merged, pair_count) — step is 1-indexed in learned order.
    Stops early if no adjacency remains."""
    words = word_counts(df, text_col).localCheckpoint()
    learned = []
    for step_no in range(1, num_merges + 1):
        pairs = words.select(
            "cnt",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN"
                    " transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] as l, syms[i + 1] as r))"
                    " ELSE array() END"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        learned.append((step_no, left, right, left + right, c))
        words = words.withColumn(
            "syms", _merge_fold(left, right)(F.col("syms"))
        ).localCheckpoint()
    if not learned:
        return spark.createDataFrame(
            [],
            "step int, left_sym string, right_sym string, merged string,"
            " pair_count long",
        )
    return spark.createDataFrame(
        learned,
        "step int, left_sym string, right_sym string, merged string,"
        " pair_count long",
    )


def bpe_oracle_sql(num_merges: int = 8, source: str = "documents",
                   text_col: str = "text") -> str:
    """DuckDB twin: the same trainer unrolled ``num_merges`` steps.
    Words are kept as delimiter-padded strings (leading/trailing
    single space, DOUBLE space between symbols) so the greedy
    left-to-right merge is a plain substring replace of
    ``' l  r '`` → ``' lr '`` — the pattern's surrounding spaces make
    symbol boundaries unambiguous, and consumed-delimiter semantics
    match the Spark fold on adjacent repeats (module doc)."""
    ctes = [
        f"""w0 AS (
      SELECT ' ' || array_to_string(
               list_transform(generate_series(1, length(w)),
                              i -> substr(w, i, 1)), '  ') || ' ' AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_filter(
                 string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                 x -> x <> '')) AS w
        FROM {source}
      ) GROUP BY 1
    )"""
    ]
    for k in range(1, num_merges + 1):
        prev = f"w{k - 1}"
        ctes.append(f"""t{k} AS (
      SELECT string_split_regex(trim(s), ' +') AS toks, cnt FROM {prev}
    ),
    p{k} AS (
      SELECT unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> struct_pack(l := toks[i], r := toks[i + 1]))) AS p,
             cnt
      FROM t{k} WHERE len(toks) >= 2
    ),
    b{k} AS (
      SELECT {k} AS step, p.l AS l, p.r AS r, SUM(cnt) AS c
      FROM p{k} GROUP BY p.l, p.r
      ORDER BY c DESC, l, r LIMIT 1
    ),
    w{k} AS (
      -- replace, then re-pad to uniform double spacing (the inserted
      -- token carries single spaces, and the NEXT step's pattern
      -- assumes doubles)
      SELECT ' ' || array_to_string(
               string_split_regex(trim(
                 replace(s, ' ' || b.l || '  ' || b.r || ' ',
                            ' ' || b.l || b.r || ' ')), ' +'), '  ')
             || ' ' AS s,
             cnt
      FROM {prev}, b{k} b
    )""")
        # NOTE: the replace above rewrites the merged token with
        # SINGLE surrounding spaces; t{k+1} re-splits on ' +' so the
        # next step renormalizes.
    selects = "\n      UNION ALL\n      ".join(
        f"SELECT step, l AS left_sym, r AS right_sym, l || r AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, num_merges + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM (\n      {selects}\n    ) ORDER BY step"
    )
