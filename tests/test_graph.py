"""Planted-graph tests for fixed-point PageRank."""

from __future__ import annotations

import pytest

from nbi_oedi_etl_v2_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_pagerank_star_hub_dominates(spark):
    # all spokes point at the hub: hub rank must exceed every spoke
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    r = {row["node"]: row["rank_fp"] for row in graph.pagerank_fixed(e).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    # spokes are symmetric — identical ranks, bit-exact
    assert len({r[i] for i in range(1, 6)}) == 1


def test_pagerank_deterministic_across_partitionings(spark):
    e = _edges(spark, [(i, (i * 7) % 23) for i in range(100) if i != (i * 7) % 23])
    r1 = sorted(graph.pagerank_fixed(e).collect())
    r2 = sorted(graph.pagerank_fixed(e.repartition(13)).collect())
    assert r1 == r2  # integer fixed-point: partitioning can't matter


def test_pagerank_cycle_is_uniform(spark):
    # a directed 4-cycle is perfectly symmetric: equal ranks
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks = {row["rank_fp"] for row in graph.pagerank_fixed(e).collect()}
    assert len(ranks) == 1


def test_pagerank_dangling_keeps_teleport_only(spark):
    # 1 -> 2; node 2 has no out-edges: its mass drops, and node 1
    # (no in-edges) holds exactly the teleport base
    e = _edges(spark, [(1, 2)])
    r = {row["node"]: row["rank_fp"] for row in graph.pagerank_fixed(e).collect()}
    scale = graph.SCALE
    base = (15 * (scale // 2)) // 100
    assert r[1] == base
    assert r[2] > r[1]


def test_pagerank_rejects_zero_iterations(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        graph.pagerank_fixed(e, iterations=0)


def test_copurchase_edges_symmetric_distinct(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 10), (2, 12)],
        "l_orderkey bigint, l_partkey bigint",
    )
    e = {(r["src"], r["dst"]) for r in graph.copurchase_edges(li).collect()}
    assert e == {(10, 11), (11, 10), (10, 12), (12, 10)}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_levels_chain_and_depth_cap(spark):
    # directed chain 1→2→…→8: exact hop counts, capped at max_depth
    chain = _edges_df(spark, [(i, i + 1) for i in range(1, 8)])
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.bfs_levels(chain, src, max_depth=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # 6..8 beyond the cap


def test_bfs_levels_min_dist_on_cycles_and_multipath(spark):
    # diamond + cycle: a node reached twice keeps its FIRST (minimum)
    # distance; the cycle back-edge must not relabel or loop
    e = _edges_df(
        spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (4, 5)]
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.bfs_levels(e, src, max_depth=10).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_bfs_levels_multi_source(spark):
    e = _edges_df(spark, [(1, 2), (2, 3), (9, 3)])
    src = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.bfs_levels(e, src, max_depth=5).collect()}
    assert got == {1: 0, 9: 0, 2: 1, 3: 1}  # 3 via 9 beats 1→2→3
