"""Distributed BPE trainer (operators/bpe.py) vs a sequential
pure-Python reference implementation — a third derivation independent
of both the Spark fold and the DuckDB string-replace oracle."""

from __future__ import annotations

import random
import re
from collections import Counter

from nbi_oedi_etl_v2_spark.operators import bpe


def _ref_bpe(texts, num_merges):
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    out = []
    for step in range(1, num_merges + 1):
        pair_counts = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += words[w]
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        out.append((step, a, b, a + b, c))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


def test_bpe_matches_reference_on_random_corpus(spark):
    random.seed(23)
    alphabet = "abcd"
    texts = [
        " ".join(
            "".join(random.choice(alphabet) for _ in range(random.randint(1, 7)))
            for _ in range(12)
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe.learn_bpe(spark, df, "text", 10).collect()]
    assert got == _ref_bpe(texts, 10)


def test_bpe_adjacent_repeat_semantics(spark):
    # 'aaa' with pair (a,a): greedy left-to-right -> [aa, a], so the
    # next round counts the (aa, a) adjacency — the classic
    # overlapping-merge trap both engines must resolve identically
    df = spark.createDataFrame([("aaa aaa ab ab",)], "text string")
    got = [tuple(r) for r in bpe.learn_bpe(spark, df, "text", 3).collect()]
    assert got == _ref_bpe(["aaa aaa ab ab"], 3)
    assert got[0][1:4] == ("a", "a", "aa")


def test_bpe_empty_and_nonalpha(spark):
    df = spark.createDataFrame([("!!! ???",), ("",)], "text string")
    assert bpe.learn_bpe(spark, df, "text", 4).count() == 0
