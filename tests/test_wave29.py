"""Wave-29 experimentation family: CUPED variance reduction and the
two-proportion z-test."""

import math

import pytest


def _cuped_reference(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    var_y = vary_n / (n * (n - 1))
    theta = cov_n / varx_n
    var_adj = (vary_n - cov_n * cov_n / varx_n) / (n * (n - 1))
    return theta, var_y, var_adj, 1.0 - var_adj / var_y


def test_cuped_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import cuped_adjustment

    # three users with pre (x) and post (y) sums; perfect x→y signal
    # for u1/u2, noise on u3
    rows = []
    data = {"u1": (10.0, 20.0), "u2": (20.0, 40.0), "u3": (30.0, 50.0)}
    for u, (x, y) in data.items():
        rows.append((u, x, "2024-01-01 00:00:00"))
        rows.append((u, y, "2024-02-01 00:00:00"))
    df = spark.createDataFrame(
        rows, "u string, v double, t string"
    ).selectExpr("u", "v", "CAST(t AS TIMESTAMP) AS t")
    out = cuped_adjustment(df, "u", "v", "t", "2024-01-15 00:00:00")
    r = out.collect()[0]
    theta, var_y, var_adj, red = _cuped_reference(list(data.values()))
    assert r.n_units == 3
    assert r.theta == pytest.approx(round(theta, 7), abs=1e-9)
    assert r.var_y == pytest.approx(round(var_y, 7), abs=1e-9)
    assert r.var_y_adj == pytest.approx(round(var_adj, 7), abs=1e-9)
    assert r.var_reduction == pytest.approx(round(red, 7), abs=1e-9)
    # CUPED can only help: adjusted variance never exceeds raw
    assert r.var_y_adj <= r.var_y


def test_cuped_degenerate_covariate(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import cuped_adjustment

    # identical pre-period sums → var_x = 0 → no signal, NULL theta
    rows = [
        ("u1", 5.0, "2024-01-01 00:00:00"),
        ("u2", 5.0, "2024-01-01 00:00:00"),
        ("u1", 7.0, "2024-02-01 00:00:00"),
        ("u2", 9.0, "2024-02-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "u string, v double, t string"
    ).selectExpr("u", "v", "CAST(t AS TIMESTAMP) AS t")
    r = cuped_adjustment(df, "u", "v", "t", "2024-01-15 00:00:00").collect()[0]
    assert r.theta is None and r.var_y_adj is None
    assert r.var_y == pytest.approx(2.0, abs=1e-9)  # var({7,9})


def test_two_proportion_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import two_proportion_ztest

    rows = [(True, s) for s in (True, True, False, False)] + [
        (False, s) for s in (True, False, False, False)
    ]
    df = spark.createDataFrame(rows, "g boolean, s boolean")
    r = two_proportion_ztest(df, "g", "s").collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (4, 4, 2, 1)
    pp = 3 / 8
    se = math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert r.z == pytest.approx(round((0.5 - 0.25) / se, 7), abs=1e-9)


def test_two_proportion_degenerate(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import two_proportion_ztest

    # all successes → pooled rate 1 → NULL z (se would be 0)
    df = spark.createDataFrame(
        [(True, True), (False, True)], "g boolean, s boolean"
    )
    r = two_proportion_ztest(df, "g", "s").collect()[0]
    assert r.z is None and r.p_a == 1.0 and r.p_b == 1.0
    # one empty arm
    df2 = spark.createDataFrame([(True, True)], "g boolean, s boolean")
    r2 = two_proportion_ztest(df2, "g", "s").collect()[0]
    assert r2.n_b == 0 and r2.z is None and r2.p_b is None


def test_welch_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0]
    rows = [(True, x) for x in a] + [(False, x) for x in b]
    df = spark.createDataFrame(rows, "g boolean, x double")
    r = welch_ttest(df, "g", "x").collect()[0]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se2a, se2b = var(a) / len(a), var(b) / len(b)
    t = (sum(a) / 4 - sum(b) / 3) / math.sqrt(se2a + se2b)
    dfree = (se2a + se2b) ** 2 / (se2a**2 / 3 + se2b**2 / 2)
    assert (r.n_a, r.n_b) == (4, 3)
    assert r.mean_a == pytest.approx(2.5, abs=1e-9)
    assert r.var_a == pytest.approx(round(var(a), 7), abs=1e-9)
    assert r.t == pytest.approx(round(t, 7), abs=1e-6)
    assert r.df == pytest.approx(round(dfree, 7), abs=1e-6)


def test_welch_degenerate(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import welch_ttest

    # constant values in both arms → zero combined se → NULL t/df
    df = spark.createDataFrame(
        [(True, 5.0), (True, 5.0), (False, 3.0), (False, 3.0)],
        "g boolean, x double",
    )
    r = welch_ttest(df, "g", "x").collect()[0]
    assert r.t is None and r.df is None and r.var_a == 0.0
    # one-row arm → NULL t
    df2 = spark.createDataFrame(
        [(True, 1.0), (False, 2.0), (False, 3.0)], "g boolean, x double"
    )
    assert welch_ttest(df2, "g", "x").collect()[0].t is None


def test_chi2_independence_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import chi2_independence

    # 2x2 table: rows a/b, cols x/y with counts [[10, 20], [30, 40]]
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "r string, c string")
    got = {(o.row_val, o.col_val): o
           for o in chi2_independence(df, "r", "c").collect()}
    tot, ra, rb, cx, cy = 100, 30, 70, 40, 60
    for (rv, cv), n in {("a", "x"): 10, ("a", "y"): 20,
                        ("b", "x"): 30, ("b", "y"): 40}.items():
        e = (ra if rv == "a" else rb) * (cx if cv == "x" else cy) / tot
        cell = got[(rv, cv)]
        assert cell.n == n
        assert cell.expected == pytest.approx(round(e, 7), abs=1e-9)
        assert cell.chi2_term == pytest.approx(
            round((n - e) ** 2 / e, 7), abs=1e-9
        )
        assert (cell.n_rows, cell.n_cols) == (2, 2)
    # independence sanity: X^2 here is the textbook 100*(10*40-20*30)^2
    # / (30*70*40*60) = 200/63
    x2 = sum(c.chi2_term for c in got.values())
    assert x2 == pytest.approx(100 * (10 * 40 - 20 * 30) ** 2
                               / (30 * 70 * 40 * 60), abs=1e-6)


def test_chi2_perfect_independence_is_zero(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import chi2_independence

    rows = [(r, c) for r in ("a", "b") for c in ("x", "y", "z")] * 5
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi2_independence(df, "r", "c").collect()
    assert len(out) == 6
    assert all(c.chi2_term == 0.0 for c in out)


def test_two_proportion_null_group_excluded_and_counted(spark):
    """VERDICT r9 wrong #1: NULL group flag = arm unknown -> neither
    arm, counted in n_null; NULL success on an assigned row = a
    non-conversion."""
    from nbi_oedi_etl_v2_spark.operators.stats import two_proportion_ztest

    rows = [(True, s) for s in (True, True, False, False)] + [
        (False, s) for s in (True, False, False, False)
    ] + [(None, True), (None, None), (True, None)]
    df = spark.createDataFrame(rows, "g boolean, s boolean")
    r = two_proportion_ztest(df, "g", "s").collect()[0]
    # the extra (True, None) row joins arm A as a non-conversion
    assert (r.n_a, r.n_b, r.n_null, r.conv_a, r.conv_b) == (5, 4, 2, 2, 1)


def test_welch_null_rows_excluded_and_counted(spark):
    """An observation needs BOTH a non-null arm and a non-null value;
    anything else is excluded from n/moments and counted in n_null
    (pre-r10 a null-valued assigned row inflated n_a while skipping
    the sums — a silent mean bias)."""
    from nbi_oedi_etl_v2_spark.operators.stats import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0]
    rows = [(True, x) for x in a] + [(False, x) for x in b] + [
        (True, None), (None, 7.0), (None, None)
    ]
    df = spark.createDataFrame(rows, "g boolean, x double")
    r = welch_ttest(df, "g", "x").collect()[0]
    assert (r.n_a, r.n_b, r.n_null) == (4, 3, 3)
    assert r.mean_a == pytest.approx(2.5, abs=1e-9)
    assert r.mean_b == pytest.approx(4.0, abs=1e-9)
