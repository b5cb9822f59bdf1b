"""Wave-11 operator tests: weighted SSSP, AGMS join-size sketches,
DP count release."""

from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators import analytics, graph, stats


# ---------------------------------------------------------------------------
# weighted SSSP (Bellman-Ford rounds)
# ---------------------------------------------------------------------------

def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def test_sssp_prefers_lighter_longer_path(spark):
    # 1→4 direct costs 10; 1→2→3→4 costs 3 — the case hop-BFS gets
    # wrong (it freezes dist(4) at first touch) and relaxation fixes
    e = _wedges(spark, [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.dist for r in graph.weighted_sssp(e, src, rounds=4).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_sssp_hop_bound_is_the_contract(spark):
    # with rounds=1 only ≤1-edge paths count: 4 keeps the direct 10
    e = _wedges(spark, [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.dist for r in graph.weighted_sssp(e, src, rounds=1).collect()}
    assert out == {1: 0, 2: 1, 4: 10}


def test_sssp_early_exit_matches_full_rounds(spark):
    e = _wedges(spark, [(1, 2, 2), (2, 3, 2), (3, 1, 2)])
    src = spark.createDataFrame([(1,)], "node long")
    fast = {
        r.node: r.dist
        for r in graph.weighted_sssp(e, src, rounds=9, early_exit=True).collect()
    }
    full = {
        r.node: r.dist
        for r in graph.weighted_sssp(e, src, rounds=9, early_exit=False).collect()
    }
    assert fast == full == {1: 0, 2: 2, 3: 4}


def test_sssp_multi_source_min(spark):
    e = _wedges(spark, [(1, 3, 5), (2, 3, 1)])
    src = spark.createDataFrame([(1,), (2,)], "node long")
    out = {r.node: r.dist for r in graph.weighted_sssp(e, src, rounds=2).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# AGMS join-size sketch
# ---------------------------------------------------------------------------

def test_agms_exact_twin_and_interval(spark, sf_dir):
    from nbi_oedi_etl_v2_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    row = stats.agms_join_size(orders, "o_orderkey", li, "l_orderkey").first()
    # every lineitem row joins exactly one order
    assert row.exact_join_size == li.count()
    assert row.within_interval
    # the estimate is unbiased-ish on real data: right order of magnitude
    assert 0.2 * row.exact_join_size < row.est_join_size < 5 * row.exact_join_size


def test_agms_disjoint_keys_estimate_near_zero(spark):
    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5000, 6000)], "k long")
    row = stats.agms_join_size(a, "k", b, "k", m=32).first()
    assert row.exact_join_size == 0
    assert row.within_interval


def test_agms_deterministic(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(500)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(300)], "k long")
    r1 = stats.agms_join_size(a, "k", b, "k", m=16).first()
    r2 = stats.agms_join_size(a, "k", b, "k", m=16).first()
    assert r1 == r2
    # exact twin: keys 0..4 shared; f_a ≈ 500/7 each, f_b = 60 each
    fa = {k: sum(1 for i in range(500) if i % 7 == k) for k in range(7)}
    assert r1.exact_join_size == sum(fa[k] * 60 for k in range(5))


# ---------------------------------------------------------------------------
# DP noised counts
# ---------------------------------------------------------------------------

def test_dp_noise_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], "id long, g string"
    )
    out1 = {r.g: r.noised_n for r in analytics.dp_noised_counts(df, ["g"], 1.0).collect()}
    out2 = {r.g: r.noised_n for r in analytics.dp_noised_counts(df, ["g"], 1.0).collect()}
    assert out1 == out2  # hash noise, no RNG state
    for g, v in out1.items():
        assert abs(v - 100) < 40  # Laplace(1) tail at 2^-52 is ~36 max
        assert v != 100  # noise actually applied


def test_dp_epsilon_scales_noise(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], "id long, g string"
    )
    tight = analytics.dp_noised_counts(df, ["g"], epsilon=10.0).collect()
    loose = analytics.dp_noised_counts(df, ["g"], epsilon=0.1).collect()
    t = {r.g: abs(r.noised_n - 100) for r in tight}
    l = {r.g: abs(r.noised_n - 100) for r in loose}
    for g in t:
        # same uniform, scale b = 1/eps: loose noise is exactly 100× tighter's
        assert abs(l[g] - 100 * t[g]) < 1e-3


def test_dp_rejects_nonpositive_epsilon(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError, match="epsilon"):
        analytics.dp_noised_counts(df, ["g"], epsilon=0.0)
