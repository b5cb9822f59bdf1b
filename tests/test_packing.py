"""Invariants for the training-corpus assembly operators
(operators.packing) that the SQL oracles can't express directly:
bin-capacity guarantees, permutation validity, mixture ratios, and
edge cases (zero-token and oversize documents)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nbi_oedi_etl_v2_spark.operators import packing
from nbi_oedi_etl_v2_spark.tables import load_table

SEQ_LEN = 4096


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


def test_global_running_total_is_exclusive_prefix_sum(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, v long"
    )
    out = {
        r["id"]: r["off"]
        for r in packing.global_running_total(df, ["id"], "v", "off").collect()
    }
    assert out == {1: 0, 2: 10, 3: 30, 4: 60}


def test_pack_chunks_offsets_and_chunk_count(spark, sf_dir):
    packed = packing.pack_chunks(_docs(spark, sf_dir), "doc_id", "n_chars", SEQ_LEN)
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["token_offset"] == acc
        acc += r["n_chars"]
    total_chunks = rows[-1]["last_chunk"] + 1
    assert total_chunks == -(-acc // SEQ_LEN)  # ceil(total/seq_len)
    for r in rows:
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1 >= 1


def test_pack_chunks_edge_docs(spark):
    # oversize doc spans chunks; zero-token doc occupies none
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 250), (4, 60)], "doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r for r in packing.pack_chunks(df, "doc_id", "n_chars", 100).collect()}
    assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0)
    assert (out[2]["first_chunk"], out[2]["last_chunk"]) == (1, 1)  # empty, at offset 100
    assert (out[3]["first_chunk"], out[3]["last_chunk"]) == (1, 3)  # 100..349 spans 3
    assert out[3]["n_chunks"] == 3
    assert (out[4]["first_chunk"], out[4]["last_chunk"]) == (3, 4)


def test_pack_next_fit_capacity_and_contiguity(spark, sf_dir):
    sharded = _docs(spark, sf_dir).withColumn(
        "shard", (F.col("doc_id") % 4).cast("long")
    )
    packed = packing.pack_next_fit(
        sharded, "doc_id", "n_chars", SEQ_LEN, shard_col="shard"
    ).collect()
    by_bin: dict[tuple, list] = {}
    for r in packed:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), rows in by_bin.items():
        total = sum(r["n_chars"] for r in rows)
        assert total <= SEQ_LEN or len(rows) == 1, (shard, b, total)
    # bins contiguous from 0 and non-decreasing in doc order per shard
    by_shard: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for shard, bins in by_shard.items():
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:])), shard


def test_pack_next_fit_oversize_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 1, 50), (0, 2, 999), (0, 3, 60)], "shard long, doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r["bin"] for r in
           packing.pack_next_fit(df, "doc_id", "n_chars", 100, "shard").collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_mixture_sample_ratios_and_binding_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    kept = packing.mixture_sample(docs, "doc_id", "source", weights)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(weights)  # unweighted sources dropped
    # uniform fixture sources → src0 is binding (frac 1.0): kept whole
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert counts["src0"] == n_src0
    # achieved mixture within md5-byte granularity of the target
    total = sum(counts.values())
    for s, w in weights.items():
        assert abs(counts[s] / total - w) < 0.05, (s, counts)
    # deterministic: a rerun keeps exactly the same rows
    again = packing.mixture_sample(docs, "doc_id", "source", weights)
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_mixture_sample_rejects_bad_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        packing.mixture_sample(docs, "doc_id", "source", {})
    with pytest.raises(ValueError):
        packing.mixture_sample(docs, "doc_id", "source", {"src0": -0.1})


def test_shuffle_rank_is_permutation_and_seed_sensitive(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    a = packing.shuffle_rank(docs, "doc_id", seed="42")
    ranks = [r["shuffle_pos"] for r in a.collect()]
    assert sorted(ranks) == list(range(1, n + 1))  # exact permutation
    b = {r["doc_id"]: r["shuffle_pos"] for r in
         packing.shuffle_rank(docs, "doc_id", seed="43").collect()}
    amap = {r["doc_id"]: r["shuffle_pos"] for r in a.collect()}
    assert amap != b  # different seed → different permutation
    again = {r["doc_id"]: r["shuffle_pos"] for r in
             packing.shuffle_rank(docs, "doc_id", seed="42").collect()}
    assert amap == again  # same seed → stable


def test_pack_ffd_capacity_and_beats_next_fit(spark, sf_dir):
    sharded = _docs(spark, sf_dir).withColumn(
        "shard", (F.col("doc_id") % 4).cast("long")
    )
    ffd = packing.pack_first_fit_decreasing(
        sharded, "doc_id", "n_chars", SEQ_LEN, "shard"
    ).collect()
    by_bin: dict[tuple, list] = {}
    for r in ffd:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r["n_chars"])
    for (shard, b), sizes in by_bin.items():
        assert sum(sizes) <= SEQ_LEN or len(sizes) == 1, (shard, b)
    nf = packing.pack_next_fit(
        sharded, "doc_id", "n_chars", SEQ_LEN, shard_col="shard"
    ).collect()
    n_bins_ffd = len(by_bin)
    n_bins_nf = len({(r["shard"], r["bin"]) for r in nf})
    assert n_bins_ffd <= n_bins_nf  # FFD never uses more bins


def test_budget_select_fills_budget_best_first(spark, sf_dir):
    from nbi_oedi_etl_v2_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_scores(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    base = docs.select("doc_id", "n_chars").join(scored, "doc_id")
    budget = 50_000
    kept = packing.budget_select(
        base, "doc_id", "n_chars", "quality_score", budget
    ).collect()
    total_kept = sum(r["n_chars"] for r in kept)
    n_all = base.count()
    # the subset reaches the budget (crossing doc included) unless the
    # whole corpus fits
    assert total_kept >= budget or len(kept) == n_all
    # best-first: every kept doc outranks every dropped doc under
    # (quality desc, doc_id asc)
    kept_ids = {r["doc_id"] for r in kept}
    ranks = {
        r["doc_id"]: (-r["quality_score"], r["doc_id"]) for r in base.collect()
    }
    worst_kept = max(ranks[i] for i in kept_ids)
    best_dropped = min(
        (ranks[i] for i in ranks if i not in kept_ids), default=None
    )
    assert best_dropped is None or worst_kept < best_dropped
