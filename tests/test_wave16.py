"""Wave-16 operator tests: rank-sum AUC and PR curves."""

import pytest

from nbi_oedi_etl_v2_spark.operators.stats import binary_auc, pr_curve


def _auc_reference(pairs):
    """O(n²) literal AUC: P(score_pos > score_neg) + ½P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_bruteforce_with_ties(spark):
    import random

    rnd = random.Random(21)
    pairs = [(round(rnd.uniform(0, 1), 1), rnd.randint(0, 1))
             for _ in range(300)]  # 1dp scores → heavy ties
    df = spark.createDataFrame(pairs, "score double, y int")
    row = binary_auc(df, "score", "y").collect()[0]
    assert row.auc == pytest.approx(_auc_reference(pairs), abs=1e-6)
    assert row.n_pos == sum(y for _, y in pairs)
    assert row.n_pos + row.n_neg == len(pairs)


def test_auc_perfect_and_inverted_separation(spark):
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y int")
    assert binary_auc(df, "score", "y").collect()[0].auc == 1.0
    inv = spark.createDataFrame(
        [(-s, y) for s, y in rows], "score double, y int"
    )
    assert binary_auc(inv, "score", "y").collect()[0].auc == 0.0


def test_auc_weighted_equals_replicated_rows(spark):
    cells = [(0.2, 0, 5), (0.2, 1, 1), (0.7, 1, 4), (0.7, 0, 2)]
    wdf = spark.createDataFrame(cells, "score double, y int, cnt long")
    rows = [(s, y) for s, y, c in cells for _ in range(c)]
    rdf = spark.createDataFrame(rows, "score double, y int")
    got_w = binary_auc(wdf, "score", "y", weight_col="cnt").collect()[0]
    got_r = binary_auc(rdf, "score", "y").collect()[0]
    assert tuple(got_w) == tuple(got_r)


def test_pr_curve_hand_computed(spark):
    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.threshold: r for r in
           pr_curve(df, "score", "y", [0.5, 0.95]).collect()}
    t = out[0.5]
    assert (t.tp, t.fp, t.fn, t.tn) == (3, 1, 0, 2)
    assert t.precision == 0.75 and t.recall == 1.0
    assert t.f1 == pytest.approx(2 * 3 / (2 * 3 + 1 + 0), abs=1e-7)
    hi = out[0.95]
    assert (hi.tp, hi.fp) == (0, 0)
    # precision undefined (no predicted positives); F1 defined (=0)
    # because actual positives exist (fn > 0)
    assert hi.precision is None and hi.f1 == 0.0 and hi.recall == 0.0


def test_pr_curve_weighted_equals_replicated(spark):
    cells = [(0.9, 1, 3), (0.4, 0, 4), (0.4, 1, 2)]
    wdf = spark.createDataFrame(cells, "score double, y int, cnt long")
    rows = [(s, y) for s, y, c in cells for _ in range(c)]
    rdf = spark.createDataFrame(rows, "score double, y int")
    got_w = [tuple(r) for r in
             pr_curve(wdf, "score", "y", [0.5], weight_col="cnt").collect()]
    got_r = [tuple(r) for r in pr_curve(rdf, "score", "y", [0.5]).collect()]
    assert got_w == got_r


# ---------------------------------------------------------------------------
# logistic_cv_auc (wave 17)
# ---------------------------------------------------------------------------

def test_cv_auc_matches_manual_per_fold_composition(spark):
    import random

    from pyspark.sql import functions as F
    from nbi_oedi_etl_v2_spark.operators.stats import (
        binary_auc,
        irls2_fit,
        logistic_cv_auc,
    )

    rnd = random.Random(31)
    rows = [(float(rnd.randint(0, 5)), float(rnd.randint(0, 3)),
             rnd.randint(0, 1), i % 3) for i in range(600)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int, fold int")
    got = {r.fold: tuple(r)[1:] for r in
           logistic_cv_auc(df, "x1", "x2", "y", "fold", n_folds=3).collect()}
    for k in range(3):
        train = df.where(F.col("fold") != k)
        b = irls2_fit(train, "x1", "x2", "y", steps=3)[-1]  # ROW path
        X1, X2 = F.col("x1").cast("double"), F.col("x2").cast("double")
        mu = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(-(F.lit(b[1]) + X1 * F.lit(b[2]) + X2 * F.lit(b[3])))
        )
        held = df.where(F.col("fold") == k).select(
            F.round(mu, 7).alias("score"), "y"
        )
        want = binary_auc(held, "score", "y").collect()[0]
        assert got[k] == (want.auc, want.n_pos, want.n_neg), k


def test_cv_auc_fold_counts_partition_the_data(spark):
    rows = [(float(i % 7), float(i % 4), i % 2, i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int, fold int")
    from nbi_oedi_etl_v2_spark.operators.stats import logistic_cv_auc

    out = logistic_cv_auc(df, "x1", "x2", "y", "fold", n_folds=5).collect()
    assert len(out) == 5
    assert sum(r.n_pos + r.n_neg for r in out) == 500


# ---------------------------------------------------------------------------
# calibration_bins / mi_contingency (wave 18)
# ---------------------------------------------------------------------------

def test_calibration_hand_computed(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import calibration_bins

    rows = [(0.05, 0), (0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1),
            (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in
           calibration_bins(df, "score", "y", n_bins=10).collect()}
    lo = out[0]
    assert (lo.n, lo.n_pos) == (3, 1)
    assert lo.mean_pred == 0.05
    assert lo.frac_pos == pytest.approx(1 / 3, abs=1e-7)
    hi = out[9]  # score 1.0 clamps into the last bin
    assert (hi.n, hi.n_pos) == (3, 3)
    assert hi.mean_pred == pytest.approx((0.95 * 2 + 1.0) / 3, abs=1e-7)
    assert hi.frac_pos == 1.0 and hi.abs_gap == pytest.approx(
        abs((0.95 * 2 + 1.0) / 3 - 1.0), abs=1e-7)


def test_mi_terms_sum_to_known_mi(spark):
    import math

    from pyspark.sql import functions as F
    from nbi_oedi_etl_v2_spark.operators.stats import mi_contingency

    # perfectly dependent feature: MI = H(Y) = ln 2 for a 50/50 label;
    # independent feature: MI = 0
    rows = [(("a" if i % 2 == 0 else "b"), ("u" if i % 4 < 2 else "v"),
             ("hi" if i % 2 == 0 else "lo")) for i in range(400)]
    df = spark.createDataFrame(rows, "dep string, ind string, lbl string")
    out = mi_contingency(df, ["dep", "ind"], "lbl")
    sums = {r.feature: r.s for r in
            out.groupBy("feature").agg(F.sum("mi_term").alias("s")).collect()}
    assert sums["dep"] == pytest.approx(math.log(2), abs=1e-5)
    assert sums["ind"] == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------------------
# target_encode_loo (wave 19)
# ---------------------------------------------------------------------------

def test_target_encode_hand_computed_and_leakage_free(spark):
    from nbi_oedi_etl_v2_spark.operators.stats import target_encode_loo

    rows = [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 0)]
    df = spark.createDataFrame(rows, "id long, cat string, y int")
    got = {r.id: r.target_enc for r in
           target_encode_loo(df, ["id"], "cat", "y", m=2.0).collect()}
    g = 2 / 4  # global rate
    # category a: nx=3, sx=2; LOO excludes the row's own label
    assert got[1] == round((g * 2 + (2 - 1)) / (2 + 2), 7)
    assert got[2] == round((g * 2 + (2 - 0)) / (2 + 2), 7)
    # rows 1 and 3 share (cat, y) → identical encodings; row 2 differs
    assert got[1] == got[3] != got[2]
    # singleton category degrades exactly to the smoothed prior g
    assert got[4] == round((g * 2 + 0) / (2 + 0), 7) == round(g, 7)


def test_target_encode_plan_broadcasts_category_stats(spark, sf_dir):
    from nbi_oedi_etl_v2_spark import workload

    df = workload.all_specs()["orders_target_encode_priority"].fn(
        spark, sf_dir
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
