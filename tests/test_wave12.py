"""Wave-12 operator tests: winsorization, hourly-profile anomalies,
FD-violation profiling."""

import math

from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators import analytics
from nbi_oedi_etl_v2_spark.operators.order_stats import winsorize
from nbi_oedi_etl_v2_spark.operators.quality import fd_violations


# ---------------------------------------------------------------------------
# winsorize
# ---------------------------------------------------------------------------

def test_winsorize_clamps_to_exact_quantiles(spark):
    # 100 longs 1..100: p10 cut = 10, p90 cut = 90 (k = ceil(q·n))
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    out = winsorize(spark, df, "v", 0.10, 0.90)
    rows = {r.v: r.v_winsorized for r in out.collect()}
    assert rows[1] == 10 and rows[9] == 10 and rows[10] == 10
    assert rows[50] == 50
    assert rows[90] == 90 and rows[91] == 90 and rows[100] == 90
    assert dict(out.dtypes)["v_winsorized"] == "bigint"


def test_winsorize_double_family(spark):
    vals = [-1e9, -2.5, 0.0, 1.25, 3.5, 7.75, 1e12]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    # p_low=0.2 → k=ceil(1.4)=2 → -2.5; p_high=0.8 → k=ceil(5.6)=6 → 7.75
    rows = {
        r.v: r.v_winsorized
        for r in winsorize(spark, df, "v", 0.2, 0.8).collect()
    }
    assert rows[-1e9] == -2.5
    assert rows[1e12] == 7.75
    assert rows[1.25] == 1.25
    assert all(not math.isnan(x) for x in rows.values())


def test_winsorize_nulls_and_empty(spark):
    df = spark.createDataFrame([(None,), (5,), (50,)], "v long")
    rows = winsorize(spark, df, "v", 0.4, 0.6).collect()
    assert any(r.v is None and r.v_winsorized is None for r in rows)
    empty = spark.createDataFrame([], "v long")
    assert winsorize(spark, empty, "v", 0.1, 0.9).count() == 0


def test_winsorize_rejects_bad_bounds(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        winsorize(spark, df, "v", 0.9, 0.1)


# ---------------------------------------------------------------------------
# hourly profile anomalies
# ---------------------------------------------------------------------------

def test_hourly_anomalies_flags_planted_outlier(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 3, 0, 0)
    # slot 3: twenty 10.0s and one 1000.0 — the spike must flag;
    # slot 4: constant values → std 0 → no flags by construction
    rows = [(base + dt.timedelta(days=i), 10.0) for i in range(20)]
    rows += [(base + dt.timedelta(days=21), 1000.0)]
    rows += [
        (dt.datetime(2024, 1, 1, 4, 0, 0) + dt.timedelta(days=i), 7.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = analytics.hourly_profile_anomalies(df, "ts", "value", 3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.slot == 3 and r.value == 1000.0 and r.zscore > 3


def test_hourly_anomalies_gaussian_rate(spark, sf_dir):
    from nbi_oedi_etl_v2_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    n = events.count()
    flagged = analytics.hourly_profile_anomalies(
        events, "ts", "value", 3.0
    ).count()
    # |z|≥3 tail of anything vaguely bell-shaped: well under 2%
    assert flagged < 0.02 * n


# ---------------------------------------------------------------------------
# FD violations
# ---------------------------------------------------------------------------

def test_fd_violations_finds_only_violators(spark):
    rows = [
        (1, "x"), (1, "x"),          # 1 → x holds
        (2, "x"), (2, "y"), (2, "y"),  # 2 violates (x, y)
        (3, None), (3, None),        # all-NULL dependent never flags
        (4, "z"), (4, None),         # one value + NULL: distinct=1, holds
    ]
    df = spark.createDataFrame(rows, "det int, dep string")
    out = {r.det: r for r in fd_violations(df, ["det"], "dep").collect()}
    assert set(out) == {2}
    assert out[2].n_rows == 3 and out[2].n_dependent_values == 2


def test_fd_violations_composite_determinant(spark):
    rows = [(1, "a", 10), (1, "a", 10), (1, "b", 10), (1, "b", 20)]
    df = spark.createDataFrame(rows, "k int, s string, dep int")
    out = fd_violations(df, ["k", "s"], "dep").collect()
    assert len(out) == 1
    assert (out[0].k, out[0].s) == (1, "b")
