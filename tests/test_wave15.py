"""Wave-15 operator tests: Newton-IRLS logistic regression and
Naive-Bayes token log-odds."""

import math

import pytest

from nbi_oedi_etl_v2_spark.operators.index import nb_token_logodds
from nbi_oedi_etl_v2_spark.operators.stats import (
    _cramer3,
    logistic_irls2,
)


# ---------------------------------------------------------------------------
# Cramer templates
# ---------------------------------------------------------------------------

def test_cramer3_solves_known_system():
    # A = [[2,1,0],[1,3,1],[0,1,2]], x = (1,-2,3) → g = A·x
    A = {"a11": 2.0, "a12": 1.0, "a13": 0.0,
         "a21": 1.0, "a22": 3.0, "a23": 1.0,
         "a31": 0.0, "a32": 1.0, "a33": 2.0}
    x = (1.0, -2.0, 3.0)
    g = {
        "g1": A["a11"] * x[0] + A["a12"] * x[1] + A["a13"] * x[2],
        "g2": A["a21"] * x[0] + A["a22"] * x[1] + A["a23"] * x[2],
        "g3": A["a31"] * x[0] + A["a32"] * x[1] + A["a33"] * x[2],
    }
    got = _cramer3({**A, **g})
    for got_i, want_i in zip(got, x):
        assert got_i == pytest.approx(want_i, abs=1e-12)


# ---------------------------------------------------------------------------
# logistic_irls2
# ---------------------------------------------------------------------------

def _local_irls(rows, steps=3):
    """Pure-python reference: same Newton iteration with exact dense
    algebra (numpy-free, 3×3 Cramer)."""
    b = [0.0, 0.0, 0.0]
    for _ in range(steps):
        A = [[0.0] * 3 for _ in range(3)]
        g = [0.0, 0.0, 0.0]
        for x1, x2, y in rows:
            eta = b[0] + x1 * b[1] + x2 * b[2]
            mu = 1.0 / (1.0 + math.exp(-eta))
            w = mu * (1.0 - mu)
            xs = (1.0, x1, x2)
            for i in range(3):
                g[i] += (y - mu) * xs[i]
                for j in range(3):
                    A[i][j] += w * xs[i] * xs[j]
        det = (A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
               - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
               + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]))

        def rep(col):
            M = [row[:] for row in A]
            for i in range(3):
                M[i][col] = g[i]
            return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1])
                    - M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0])
                    + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]))

        b = [b[i] + rep(i) / det for i in range(3)]
    return b


def test_logreg_matches_local_newton(spark):
    import random

    rnd = random.Random(9)
    rows = []
    for _ in range(400):
        x1, x2 = rnd.uniform(-2, 2), rnd.uniform(-2, 2)
        p = 1.0 / (1.0 + math.exp(-(0.5 + 1.5 * x1 - 0.8 * x2)))
        rows.append((x1, x2, 1 if rnd.random() < p else 0))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    got = {r.step: (r.b0, r.b1, r.b2)
           for r in logistic_irls2(df, "x1", "x2", "y", steps=3).collect()}
    want = _local_irls([(x1, x2, float(y)) for x1, x2, y in rows], steps=3)
    for i in range(3):
        assert got[3][i] == pytest.approx(want[i], abs=1e-5)
    # and the fit roughly recovers the generating coefficients
    assert 0.8 < got[3][1] < 2.5 and -1.8 < got[3][2] < -0.3


def test_logreg_perfectly_balanced_null_model(spark):
    # symmetric labels independent of x → β ≈ 0 except intercept=0
    rows = [(float(i % 7), float(i % 5), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    out = {r.step: (r.b0, r.b1, r.b2)
           for r in logistic_irls2(df, "x1", "x2", "y", steps=2).collect()}
    assert abs(out[2][0]) < 0.5 and abs(out[2][1]) < 0.2 and abs(out[2][2]) < 0.2


def test_irls_step_agg_is_one_partial_pass(spark, sf_dir):
    # the whole data-sized plan of a Newton step: ONE aggregate,
    # map-side combined, no Python workers, no join
    from nbi_oedi_etl_v2_spark.operators.stats import _irls_step_agg
    from nbi_oedi_etl_v2_spark.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_quantity",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    agg = _irls_step_agg(li, "l_discount", "l_quantity", "y", (0.1, 0.2, 0.3))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert plan.count("FileScan") == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "SortMergeJoin", "CartesianProduct"):
        assert marker not in plan


# ---------------------------------------------------------------------------
# nb_token_logodds
# ---------------------------------------------------------------------------

def test_nb_hand_computed_smoothed_logodds(spark):
    df = spark.createDataFrame(
        [
            (0, "good good great", 1),
            (1, "bad awful bad", 0),
            (2, "good bad", 1),
        ],
        "doc_id long, text string, y int",
    )
    got = {r.tok: (r.n_pos, r.n_neg, r.log_odds) for r in
           nb_token_logodds(df, "doc_id", "text", "y", alpha=1.0, k=10).collect()}
    # class totals: pos tokens = 5 (good×3, great, bad), neg = 3; V = 4
    def lo(np_, nn):
        return round(math.log((np_ + 1.0) / (5 + 1.0 * 4))
                     - math.log((nn + 1.0) / (3 + 1.0 * 4)), 5)

    assert got["good"] == (3, 0, lo(3, 0))
    assert got["great"] == (1, 0, lo(1, 0))
    assert got["bad"] == (1, 2, lo(1, 2))
    assert got["awful"] == (0, 1, lo(0, 1))
    # ordering: strongest positive discriminator first
    toks = [r.tok for r in
            nb_token_logodds(df, "doc_id", "text", "y", k=10).collect()]
    assert toks[0] == "good" and toks[-1] == "awful"


def test_nb_topk_cut_is_deterministic(spark):
    # many tokens with identical counts → rounded ties broken by tok
    docs = [(i, " ".join(f"tok{j:03d}" for j in range(20)), i % 2)
            for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string, y int")
    out = [r.tok for r in
           nb_token_logodds(df, "doc_id", "text", "y", k=5).collect()]
    assert out == [f"tok{j:03d}" for j in range(5)]


def test_logreg_cells_path_bit_identical_to_row_path(spark):
    import random

    rnd = random.Random(12)
    # low-cardinality grid: the sufficient-cells applicability domain
    rows = [(float(rnd.randint(0, 10)) / 100.0, float(rnd.randint(1, 50)),
             rnd.randint(0, 1)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    row_path = logistic_irls2(df, "x1", "x2", "y", steps=3).collect()
    cell_path = logistic_irls2(
        df, "x1", "x2", "y", steps=3, sufficient_cells=True
    ).collect()
    # decimal(term)×count is exactly count row-level decimal addends,
    # so the two paths must agree to the BIT, not approximately
    assert [tuple(r) for r in row_path] == [tuple(r) for r in cell_path]


def test_logreg_cells_scan_is_count_only(spark, sf_dir):
    # the data-sized plan of the cells path: one long-count hash
    # aggregate — no decimal arithmetic, no exp(), in the big scan
    from nbi_oedi_etl_v2_spark.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_quantity",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cells = li.groupBy("l_discount", "l_quantity", "y").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert "Decimal" not in plan and "EXP" not in plan.upper().replace(
        "EXPRESSION", "").replace("EXPAND", "")
