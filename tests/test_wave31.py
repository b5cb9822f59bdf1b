"""Wave-31 inference completion: one-way ANOVA F, Brown-Forsythe
variance homogeneity, the two-group log-rank test, and BH-FDR
multiple testing."""

import math

import pytest


def test_anova_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import anova_oneway

    rows = (
        [("A", float(v)) for v in (1, 2, 3)]
        + [("B", float(v)) for v in (2, 4, 6)]
        + [("C", float(v)) for v in (10, 12)]
        + [(None, 99.0), ("A", None)]  # excluded, counted in n_null
    )
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r.g: r for r in anova_oneway(df, "g", "x").collect()}
    assert set(out) == {"A", "B", "C"}
    # SSW = 2 + 8 + 2 = 12, SST = 314 - 40^2/8 = 114, SSB = 102
    # F = (102/2) / (12/5) = 21.25
    a = out["A"]
    assert (a.n, a.k, a.df1, a.df2, a.n_null) == (3, 3, 2, 5, 2)
    assert a.mean == pytest.approx(2.0, abs=1e-12)
    assert a.var == pytest.approx(1.0, abs=1e-12)
    assert a.f == pytest.approx(21.25, abs=1e-9)
    assert a.eta2 == pytest.approx(round(102 / 114, 7), abs=1e-9)
    # every group row repeats the shared statistics
    assert out["B"].f == a.f and out["C"].f == a.f


def test_anova_degenerate_single_group(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import anova_oneway

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0)], "g string, x double"
    )
    r = anova_oneway(df, "g", "x").collect()[0]
    assert r.k == 1 and r.f is None and r.eta2 is None


def test_brown_forsythe_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import brown_forsythe

    rows = [("A", v) for v in (1, 2, 3, 4)] + [
        ("B", v) for v in (10, 10, 40)
    ] + [(None, 7), ("B", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in brown_forsythe(df, "g", "v").collect()}
    a, b = out["A"], out["B"]
    # lower medians: A (even n=4) -> 2, B -> 10
    assert (a.median, b.median) == (2, 10)
    assert (a.n, b.n, a.n_null) == (4, 3, 2)
    assert a.mean_absdev == pytest.approx(1.0, abs=1e-12)
    assert b.mean_absdev == pytest.approx(10.0, abs=1e-12)
    # deviations: A [1,0,1,2] ssw=2; B [0,0,30] ssw=600
    ssw, n, k = 602.0, 7, 2
    s, ss = 34.0, 906.0
    sst = ss - s * s / n
    f = ((sst - ssw) / (k - 1)) / (ssw / (n - k))
    assert a.f == pytest.approx(round(f, 7), abs=1e-9)
    assert (a.df1, a.df2) == (1, 5)


def _logrank_reference(subjects):
    """O1/E1/V from the textbook per-distinct-time loop."""
    times = sorted({t for t, _, _ in subjects})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for ti, _, a in subjects if ti >= t and a)
        n2 = sum(1 for ti, _, a in subjects if ti >= t and not a)
        d1 = sum(1 for ti, e, a in subjects if ti == t and e and a)
        d2 = sum(1 for ti, e, a in subjects if ti == t and e and not a)
        n, d = n1 + n2, d1 + d2
        o1 += d1
        if n > 0:
            e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    return o1, e1, v


def test_logrank_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import logrank_test

    subjects = [
        (1, 1, True), (2, 0, True), (3, 1, True), (5, 0, True),
        (1, 0, False), (2, 1, False), (2, 1, False), (4, 1, False),
    ]
    df = spark.createDataFrame(subjects, "t long, e int, a boolean")
    r = logrank_test(df, "t", "e", "a").collect()[0]
    o1, e1, v = _logrank_reference(subjects)
    assert (r.n_a, r.n_b, r.n_events, r.n_null) == (4, 4, 5, 0)
    assert r.o1 == o1
    assert r.e1 == pytest.approx(round(e1, 7), abs=1e-9)
    assert r.v == pytest.approx(round(v, 7), abs=1e-9)
    z = (o1 - e1) / math.sqrt(v)
    assert r.z == pytest.approx(round(z, 7), abs=1e-9)
    assert r.chi2 == pytest.approx(round(z * z, 7), abs=1e-9)


def test_logrank_null_subjects_counted(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import logrank_test

    df = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (None, 1, True), (3, None, False),
         (4, 0, None)],
        "t long, e int, a boolean",
    )
    r = logrank_test(df, "t", "e", "a").collect()[0]
    assert (r.n_a, r.n_b, r.n_null) == (1, 1, 3)


def _phi_p(z):
    """The shared Zelen-Severo two-sided p (same literals)."""
    za = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * za)
    poly = t * (0.319381530 + t * (-0.356563782 + t * (
        1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    return 2.0 * math.exp(-za * za / 2.0) * 0.3989422804014327 * poly


def test_bh_fdr_selection_matches_reference(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import bh_fdr

    # 30 keys near the global mean, 3 far outliers with many samples
    rows = []
    for i in range(30):
        for j in range(4):
            rows.append((f"k{i:02d}", 100.0 + (i % 5) + 0.25 * j))
    for i in range(3):
        for j in range(20):
            rows.append((f"hot{i}", 160.0 + i + 0.1 * j))
    df = spark.createDataFrame(rows, "key string, x double")
    out = bh_fdr(df, "key", "x", q=0.05).collect()
    assert len(out) == 33 and all(r.m == 33 for r in out)
    # python reference of the same screen
    import collections
    cells = collections.defaultdict(list)
    for k, x in rows:
        cells[k].append(x)
    n = len(rows)
    s = sum(x for _, x in rows)
    ss = sum(x * x for _, x in rows)
    mu = s / n
    var = (n * ss - s * s) / (n * (n - 1))
    ps = {}
    for k, xs in cells.items():
        z = (sum(xs) / len(xs) - mu) / (
            math.sqrt(var) / math.sqrt(len(xs))
        )
        ps[k] = round(_phi_p(z), 7)
    m = len(ps)
    ordered = sorted(ps.values())
    k_star, p_star = 0, None
    for i, p in enumerate(ordered, start=1):
        if p <= i * 0.05 / m:
            k_star, p_star = i, p
    expect_reject = {k for k, p in ps.items()
                     if p_star is not None and p <= p_star}
    got_reject = {r[0] for r in out if r.rejected}
    assert got_reject == expect_reject
    assert {f"hot{i}" for i in range(3)} <= got_reject
    for r in out:
        assert r.p == pytest.approx(ps[r[0]], abs=2e-7)
        assert r.k_star == k_star
    # inclusive-rank bookkeeping: #rejected == k_star
    assert sum(1 for r in out if r.rejected) == k_star


def test_bh_fdr_null_and_no_rejections(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import bh_fdr

    rows = [("a", 1.0), ("a", 2.0), ("b", 1.5), ("b", 1.6),
            (None, 9.0), ("c", None)]
    df = spark.createDataFrame(rows, "key string, x double")
    out = {r[0]: r for r in bh_fdr(df, "key", "x", q=0.05).collect()}
    # "c" has n=0 observed values -> not tested at all
    assert set(out) == {"a", "b"}
    assert out["a"].n_null == 2 and out["a"].m == 2
    assert out["a"].k_star == 0 and out["a"].p_star is None
    assert out["a"].rejected is False


# --- property-style invariants (hypothesis; few examples — each is
# a Spark job, the value is input diversity) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FEW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_groups = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=6,
    max_size=40,
)


@FEW
@given(rows=_groups)
def test_anova_f_nonneg_eta2_bounded(spark, rows):
    from nbi_oedi_etl_v2_spark.operators.stats import anova_oneway

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, x double"
    )
    out = anova_oneway(df, "g", "x").collect()
    fs = {r.f for r in out}
    assert len(fs) == 1  # shared statistic repeated per group
    f = fs.pop()
    if f is not None:
        assert f >= -1e-9
    for r in out:
        if r.eta2 is not None:
            assert -1e-9 <= r.eta2 <= 1 + 1e-9


@FEW
@given(rows=_groups)
def test_brown_forsythe_scale_invariance(spark, rows):
    """Multiplying integer values by a constant scales medians and
    deviations linearly and leaves the F ratio unchanged (exact in
    integer cents — both runs see exact arithmetic)."""
    from nbi_oedi_etl_v2_spark.operators.stats import brown_forsythe

    df1 = spark.createDataFrame(rows, "g string, v long")
    df2 = spark.createDataFrame(
        [(g, v * 7) for g, v in rows], "g string, v long"
    )
    r1 = {r.g: r for r in brown_forsythe(df1, "g", "v").collect()}
    r2 = {r.g: r for r in brown_forsythe(df2, "g", "v").collect()}
    assert set(r1) == set(r2)
    for g in r1:
        assert r2[g].median == r1[g].median * 7
        if r1[g].f is None:
            assert r2[g].f is None
        else:
            assert r2[g].f == pytest.approx(r1[g].f, rel=1e-6, abs=1e-6)


@FEW
@given(
    subj=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=1),
            st.booleans(),
        ),
        min_size=4,
        max_size=30,
    )
)
def test_logrank_arm_swap_negates_z(spark, subj):
    """Swapping the arms negates z and preserves chi2/v — the
    two-sided statistic cannot depend on which arm is 'A'."""
    from nbi_oedi_etl_v2_spark.operators.stats import logrank_test

    df = spark.createDataFrame(subj, "t long, e int, a boolean")
    swapped = spark.createDataFrame(
        [(t, e, not a) for t, e, a in subj], "t long, e int, a boolean"
    )
    r1 = logrank_test(df, "t", "e", "a").collect()[0]
    r2 = logrank_test(swapped, "t", "e", "a").collect()[0]
    assert (r1.n_a, r1.n_b) == (r2.n_b, r2.n_a)
    assert r1.v == pytest.approx(r2.v, abs=1e-9)
    if r1.z is None:
        assert r2.z is None
    else:
        assert r1.z == pytest.approx(-r2.z, abs=2e-7)
        assert r1.chi2 == pytest.approx(r2.chi2, abs=2e-7)


def test_bh_fdr_monotone_in_q(spark):
    """BH at a smaller q can only reject a subset of a larger q's
    rejections (step-up monotonicity)."""
    from nbi_oedi_etl_v2_spark.operators.stats import bh_fdr

    rows = []
    for i in range(20):
        for j in range(5):
            rows.append((f"k{i:02d}", 10.0 + i + 0.3 * j))
    df = spark.createDataFrame(rows, "key string, x double")
    rej = {}
    for q in (0.01, 0.05, 0.25):
        out = bh_fdr(df, "key", "x", q=q).collect()
        rej[q] = {r[0] for r in out if r.rejected}
        assert sum(1 for r in out if r.rejected) == out[0].k_star
    assert rej[0.01] <= rej[0.05] <= rej[0.25]
