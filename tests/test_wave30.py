"""Wave-30 rank statistics: Mann-Whitney U and sort-free Spearman
rank correlation (both on the shared two-level prefix scan)."""

import math

import pytest


def test_mann_whitney_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import mann_whitney_u

    # A = {1,2,3}, B = {3,4}; midranks 1, 2, 3.5, 3.5, 5
    # R_A = 6.5 -> 2R = 13; U_A = 6.5 - 3*4/2 = 0.5 -> u2 = 1
    rows = [(1, True), (2, True), (3, True), (3, False), (4, False)]
    df = spark.createDataFrame(rows, "v long, f boolean")
    r = mann_whitney_u(df, "v", "f").collect()[0]
    assert (r.n_a, r.n_b, r.n_null, r.u2) == (3, 2, 0, "1")
    assert r.u == pytest.approx(0.5, abs=1e-9)
    # tie term: value 3 has c=2 -> T = 6; N = 5
    var = 3 * 2 / 12 * ((5 + 1) - 6 / (5 * 4))
    z = (0.5 - 3 * 2 / 2) / math.sqrt(var)
    assert r.z == pytest.approx(round(z, 7), abs=1e-9)


def test_mann_whitney_null_flags_and_degenerate(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import mann_whitney_u

    rows = [(1, True), (2, True), (3, True), (3, False), (4, False),
            (7, None), (1, None)]
    df = spark.createDataFrame(rows, "v long, f boolean")
    r = mann_whitney_u(df, "v", "f").collect()[0]
    # identical to the hand fixture once nulls are excluded
    assert (r.n_a, r.n_b, r.n_null, r.u2) == (3, 2, 2, "1")
    # all values tied -> zero variance -> NULL z (u still defined)
    df2 = spark.createDataFrame(
        [(5, True), (5, True), (5, False)], "v long, f boolean"
    )
    r2 = mann_whitney_u(df2, "v", "f").collect()[0]
    assert r2.z is None and r2.u == pytest.approx(1.0, abs=1e-9)
    # one empty arm
    df3 = spark.createDataFrame([(1, True)], "v long, f boolean")
    r3 = mann_whitney_u(df3, "v", "f").collect()[0]
    assert r3.n_b == 0 and r3.z is None and r3.u is None


def test_spearman_perfect_monotone(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "x long, y long"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 3 and r.rho == pytest.approx(1.0, abs=1e-9)
    df2 = spark.createDataFrame(
        [(1, 30), (2, 20), (3, 10)], "x long, y long"
    )
    assert spearman_corr(df2, "x", "y").collect()[0].rho == pytest.approx(
        -1.0, abs=1e-9
    )


def test_spearman_ties_match_pearson_on_midranks(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import spearman_corr

    # x = [1,1,2] -> midranks [1.5, 1.5, 3]; y = [5,6,7] -> [1,2,3]
    # Pearson on midranks = 1.5 / sqrt(1.5 * 2) = 0.8660254
    df = spark.createDataFrame(
        [(1, 5), (1, 6), (2, 7)], "x long, y long"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.rho == pytest.approx(round(1.5 / math.sqrt(3.0), 7), abs=1e-9)


def test_spearman_nulls_and_constant_column(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import spearman_corr

    rows = [(1, 10), (2, 20), (3, 30), (None, 40), (4, None), (None, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert (r.n, r.n_null) == (3, 3)
    assert r.rho == pytest.approx(1.0, abs=1e-9)
    # constant x -> zero rank variance -> NULL rho
    df2 = spark.createDataFrame(
        [(7, 1), (7, 2), (7, 3)], "x long, y long"
    )
    assert spearman_corr(df2, "x", "y").collect()[0].rho is None
