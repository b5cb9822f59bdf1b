"""Wave-13 operator tests: distributed global percentile ranks and
PSI drift detection."""

from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators import analytics
from nbi_oedi_etl_v2_spark.operators.order_stats import (
    global_percentile_ranks,
)


# ---------------------------------------------------------------------------
# global percentile ranks
# ---------------------------------------------------------------------------

def test_pct_rank_matches_window_semantics(spark):
    # values with heavy ties: 1,1,2,2,2,5 (n=6)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 1, 2, 2, 2, 5])], "id int, v long"
    )
    got = {
        r.id: (r.pct_rank, r.cume_dist)
        for r in global_percentile_ranks(df, "v").collect()
    }
    # percent_rank = count_less/(n-1); cume_dist = count_le/n
    for i, v in enumerate([1, 1, 2, 2, 2, 5]):
        less = sum(1 for x in [1, 1, 2, 2, 2, 5] if x < v)
        le = sum(1 for x in [1, 1, 2, 2, 2, 5] if x <= v)
        assert got[i] == (round(less / 5, 7), round(le / 6, 7)), i


def test_pct_rank_agrees_with_spark_window(spark):
    import random

    rnd = random.Random(3)
    rows = [(i, rnd.randint(0, 30)) for i in range(500)]
    df = spark.createDataFrame(rows, "id int, v long")
    from pyspark.sql import Window

    w = Window.orderBy("v")
    expected = {
        r.id: (round(r.p, 7), round(r.c, 7))
        for r in df.select(
            "id",
            F.percent_rank().over(w).alias("p"),
            F.cume_dist().over(w).alias("c"),
        ).collect()
    }
    got = {
        r.id: (r.pct_rank, r.cume_dist)
        for r in global_percentile_ranks(df, "v").collect()
    }
    assert got == expected


def test_pct_rank_nulls_and_single_row(spark):
    df = spark.createDataFrame([(1, None), (2, 7)], "id int, v long")
    got = {r.id: (r.pct_rank, r.cume_dist)
           for r in global_percentile_ranks(df, "v").collect()}
    assert got[1] == (None, None)       # windows skip NULLs; so do we
    assert got[2] == (0.0, 1.0)         # n=1: denom guard


def test_pct_rank_no_global_window_in_plan(spark):
    # the point of the operator: the only window runs over the
    # distinct-value table, so the full-table sort never appears —
    # the join back is the data-sized op
    df = spark.createDataFrame([(i, i % 9) for i in range(100)], "id int, v long")
    plan = global_percentile_ranks(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # over the distinct table
    # the data-side lineage must not sort the full table globally:
    # a global window would show a single-partition Exchange
    assert "SinglePartition" not in plan.split("Window")[0]


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------

def test_psi_zero_for_identical_snapshots(spark):
    df = spark.createDataFrame([(float(i % 37),) for i in range(1000)], "v double")
    out = analytics.psi_drift(df, df, "v", n_bins=5).collect()
    assert len(out) == 5
    assert all(abs(r.psi_term) < 1e-9 for r in out)
    assert abs(sum(r.ref_share for r in out) - 1.0) < 1e-6


def test_psi_detects_planted_shift(spark):
    ref = spark.createDataFrame([(float(i % 100),) for i in range(2000)], "v double")
    cur = spark.createDataFrame(
        [(float(i % 100) + 80.0,) for i in range(2000)], "v double"
    )
    out = analytics.psi_drift(ref, cur, "v", n_bins=10).collect()
    total = sum(r.psi_term for r in out)
    assert total > 0.25  # the "retrain" threshold fires on a real shift
    # shifted mass left the low bins entirely → eps clamp engaged
    assert any(r.cur_share <= 1e-6 for r in out)


def test_psi_empty_reference_graceful(spark):
    empty = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    assert analytics.psi_drift(empty, cur, "v").count() == 0
