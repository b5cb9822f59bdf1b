"""Planted-case tests for the Ed-Join fuzzy self-join."""

from __future__ import annotations

from nbi_oedi_etl_v2_spark.operators import fuzzy


def _pairs(df):
    return sorted((r.id_a, r.id_b, r.dist) for r in df.collect())


def test_planted_edit_distances(spark):
    rows = [
        (1, "kitten"),
        (2, "sitten"),    # dist 1 from kitten
        (3, "sitting"),   # dist 2 from sitten, 3 from kitten
        (4, "banana"),
        (5, "bananas"),   # dist 1 from banana
        (6, "unrelated"),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    out = fuzzy.edit_distance_pairs(df, "id", "s", max_dist=2, q=2)
    assert _pairs(out) == [(1, 2, 1), (2, 3, 2), (4, 5, 1)]


def test_short_strings_not_lost(spark):
    # strings below the q-gram length must still pair up via the
    # short bucket — the prefix join alone would silently drop them
    rows = [(1, "a"), (2, "b"), (3, ""), (4, "ab"), (5, "xyzw")]
    df = spark.createDataFrame(rows, "id int, s string")
    out = fuzzy.edit_distance_pairs(df, "id", "s", max_dist=1, q=2)
    assert _pairs(out) == [(1, 2, 1), (1, 3, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1)]


def test_no_shared_gram_regime_not_lost(spark):
    # "axa" vs "aya": levenshtein 1 but ZERO shared bigrams — the
    # q-gram count bound is vacuous below length (k+1)·q, so these
    # must come from the widened short bucket. A bucket bounded at
    # length < q + max_dist (the naive reading) silently loses them.
    rows = [(1, "axa"), (2, "aya"), (3, "azb")]
    df = spark.createDataFrame(rows, "id int, s string")
    out = fuzzy.edit_distance_pairs(df, "id", "s", max_dist=1, q=2)
    assert _pairs(out) == [(1, 2, 1)]


def test_exactness_vs_bruteforce(spark):
    # 200 pseudo-random-ish strings; prefix-filtered result must
    # equal the exhaustive cross-join result exactly
    import hashlib

    rows = [
        (i, hashlib.md5(str(i // 3).encode()).hexdigest()[: 6 + i % 3])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    out = _pairs(fuzzy.edit_distance_pairs(df, "id", "s", max_dist=2, q=2))
    import itertools

    brute = sorted(
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 2
    )
    assert out == brute


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]
