"""Text analysis operators (north-star extension): token counting,
quality scoring, language ID, document fingerprinting.

Everything is codegen'd column expressions (regexp + higher-order
functions) so a 100 TB corpus pays one scan and zero shuffles —
these are map-only operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists — enough for an n-gram/stopword
# heuristic; deliberately small so both engines can inline them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "für", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"],
}
LANG_PRIORITY = ["en", "es", "de", "fr"]  # deterministic tie-break

# BPE-ish: words|numbers|punct. Doubled backslash: this string is
# embedded in Spark SQL text, whose literal parser consumes one level
# of escaping before the regex engine sees it.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"
WORD_PATTERN = "[a-z0-9]+"
FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MULT = 31


def _tokens(text_col: str) -> str:
    return f"regexp_extract_all(lower(`{text_col}`), '{WORD_PATTERN}', 0)"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish token counts and char stats per document."""
    ws_tokens = f"size(split(trim(`{text_col}`), '\\\\s+'))"
    bpe_tokens = f"size(regexp_extract_all(`{text_col}`, '{TOKEN_PATTERN}', 0))"
    return df.select(
        F.col(f"`{id_col}`").alias("doc_id"),
        F.length(F.col(f"`{text_col}`")).cast("bigint").alias("n_chars_actual"),
        F.expr(ws_tokens).cast("bigint").alias("n_ws_tokens"),
        F.expr(bpe_tokens).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.expr(_tokens(text_col))).cast("bigint").alias("n_word_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + one blended score in [0, 1]:
    length band, punctuation ratio, stopword ratio, mean word length.
    The weights are arbitrary but fixed — the operator contract is
    determinism, not linguistic truth."""
    text = f"`{text_col}`"
    tokens = _tokens(text_col)
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_chars = f"length({text})"
    n_tokens = f"size({tokens})"
    punct = f"size(regexp_extract_all({text}, '[^a-zA-Z0-9\\\\s]', 0))"
    stop_hits = f"size(filter({tokens}, t -> array_contains(array({en}), t)))"

    punct_ratio = f"CASE WHEN {n_chars} = 0 THEN 0D ELSE CAST({punct} AS DOUBLE) / {n_chars} END"
    stop_ratio = f"CASE WHEN {n_tokens} = 0 THEN 0D ELSE CAST({stop_hits} AS DOUBLE) / {n_tokens} END"
    mean_word_len = (
        f"CASE WHEN {n_tokens} = 0 THEN 0D ELSE "
        f"CAST(aggregate({tokens}, 0, (acc, t) -> acc + length(t)) AS DOUBLE) / {n_tokens} END"
    )
    length_score = f"least(CAST({n_chars} AS DOUBLE) / 500D, 1D)"
    quality = (
        f"round(0.4D * ({length_score}) + 0.3D * least(({stop_ratio}) * 5D, 1D) "
        f"+ 0.3D * (1D - least(({punct_ratio}) * 10D, 1D)), 7)"
    )
    return df.select(
        F.col(f"`{id_col}`").alias("doc_id"),
        F.expr(n_chars).cast("bigint").alias("n_chars_actual"),
        F.expr(n_tokens).cast("bigint").alias("n_tokens"),
        F.round(F.expr(punct_ratio), 7).alias("punct_ratio"),
        F.round(F.expr(stop_ratio), 7).alias("stopword_ratio"),
        F.round(F.expr(mean_word_len), 7).alias("mean_word_len"),
        F.expr(quality).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language ID with deterministic priority-order
    tie-break. Returns (doc_id, lang_pred, per-language hit counts)."""
    tokens = _tokens(text_col)
    hits = {}
    for lang in LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hits[lang] = f"size(filter({tokens}, t -> array_contains(array({words}), t)))"
    best = f"greatest({', '.join(hits[lang] for lang in LANG_PRIORITY)})"
    pick = "CASE "
    for lang in LANG_PRIORITY:
        pick += f"WHEN ({best}) > 0 AND {hits[lang]} = ({best}) THEN '{lang}' "
    pick += "ELSE 'unknown' END"
    cols = [F.col(f"`{id_col}`").alias("doc_id"), F.expr(pick).alias("lang_pred")]
    cols += [
        F.expr(hits[lang]).cast("bigint").alias(f"hits_{lang}") for lang in LANG_PRIORITY
    ]
    return df.select(*cols)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Polynomial rolling hash of the raw text, mod 1e9+7 with
    multiplier 31 — small enough that the fold never overflows int64
    (ANSI mode would reject overflow), portable enough that any other
    engine can replicate it for verification."""
    # sequence+substring (not split('')) so the per-char iteration is
    # portable 1:1 to other engines; Spark's sequence(1, 0) would run
    # DESCENDING, hence the empty-string guard.
    codes = (
        f"transform(sequence(1, length(`{text_col}`)), "
        f"i -> CAST(ascii(substring(`{text_col}`, i, 1)) AS BIGINT))"
    )
    fp = (
        f"CASE WHEN length(`{text_col}`) = 0 OR `{text_col}` IS NULL THEN 0L "
        f"ELSE aggregate({codes}, 0L, "
        f"(acc, c) -> (acc * {FINGERPRINT_MULT} + c) % {FINGERPRINT_MOD}) END"
    )
    return df.select(
        F.col(f"`{id_col}`").alias("doc_id"),
        F.expr(fp).alias("fingerprint"),
    )
