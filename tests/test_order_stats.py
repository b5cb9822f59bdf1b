"""Distributed radix quickselect (operators/order_stats.py): exact
order statistics without a sort — property-tested against the sorted
truth, including negatives, heavy ties, extreme ranks, and empties."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators.order_stats import exact_quantiles_radix


def _truth(vals, q):
    k = max(1, math.ceil(q * len(vals) - 1e-9))
    return sorted(vals)[k - 1]


def test_radix_select_matches_sorted_truth(spark):
    random.seed(11)
    vals = (
        [random.randint(-(10**14), 10**14) for _ in range(4000)]
        + [0] * 97          # heavy tie at zero
        + [-3] * 53         # negative tie
        + [2**62, -(2**62)]  # extreme magnitudes
    )
    df = spark.createDataFrame([(x,) for x in vals], "v long")
    qs = [0.001, 0.25, 0.5, 0.75, 0.999, 1.0]
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_radix(spark, df, "v", qs).collect()
    }
    for q in qs:
        assert got[q] == _truth(vals, q), q


def test_radix_select_single_row_and_nulls(spark):
    df = spark.createDataFrame([(42,), (None,)], "v long")
    rows = exact_quantiles_radix(spark, df, "v", [0.5, 1.0]).collect()
    assert all(r["value"] == 42 for r in rows)


def test_radix_select_empty_input(spark):
    df = spark.createDataFrame([], "v long")
    rows = exact_quantiles_radix(spark, df, "v", [0.5]).collect()
    assert len(rows) == 1 and rows[0]["value"] is None


def test_radix_select_matches_spark_percentile(spark, sf_dir):
    from nbi_oedi_etl_v2_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_radix(spark, li, "c", [0.5, 0.9]).collect()
    }
    # percentile_disc-style lower order statistic via a window rank
    n = li.count()
    for q in [0.5, 0.9]:
        k = max(1, math.ceil(q * n - 1e-9))
        exp = (
            li.orderBy("c").limit(k).agg(F.max("c").alias("m")).first()["m"]
        )
        assert got[q] == exp, q


def test_weighted_radix_matches_cumulative_truth(spark):
    import math
    import random

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        exact_weighted_quantiles_radix,
    )

    random.seed(31)
    rows = [
        (random.randint(-(10**9), 10**9), random.randint(1, 50))
        for _ in range(3000)
    ] + [(7, 10**6)]  # one dominant weight pins the median to 7
    df = spark.createDataFrame(rows, "v long, w long")
    qs = [0.1, 0.5, 0.95, 1.0]
    got = {
        r["quantile"]: r["value"]
        for r in exact_weighted_quantiles_radix(
            spark, df, "v", "w", qs
        ).collect()
    }
    total = sum(w for _, w in rows)
    sorted_rows = sorted(rows)
    for q in qs:
        k = max(1, math.ceil(q * total - 1e-9))
        cum = 0
        for v, w in sorted_rows:
            cum += w
            if cum >= k:
                assert got[q] == v, (q, got[q], v)
                break
    assert got[0.5] == 7


def test_weighted_radix_nonpositive_weights_excluded(spark):
    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        exact_weighted_quantiles_radix,
    )

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 2)], "v long, w long"
    )
    rows = exact_weighted_quantiles_radix(spark, df, "v", "w", [0.5]).collect()
    assert rows[0]["value"] == 4


def test_equidepth_ties_land_in_lower_bucket(spark):
    from nbi_oedi_etl_v2_spark.operators.order_stats import equidepth_buckets

    # 8 copies of the same value + 2 larger: the q=0.5 cut IS the tied
    # value, and strict-less-than labeling keeps all ties in bucket 0
    df = spark.createDataFrame([(5,)] * 8 + [(9,), (11,)], "v long")
    rows = {r["bucket"]: r for r in equidepth_buckets(spark, df, "v", 2).collect()}
    assert rows[0]["n_rows"] == 8 and rows[0]["max_v"] == 5
    assert rows[1]["n_rows"] == 2 and rows[1]["min_v"] == 9


def test_equidepth_empty_and_all_null_input(spark):
    # ADVICE r5: int(None) used to raise; empty/all-NULL input must
    # return the empty grouped schema, matching exact_quantiles_radix
    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        equidepth_buckets,
    )

    empty = spark.createDataFrame([], "v long")
    out = equidepth_buckets(spark, empty, "v", 4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "bucket", "n_rows", "min_v", "max_v",
    ]
    nulls = spark.createDataFrame([(None,), (None,)], "v long")
    assert equidepth_buckets(spark, nulls, "v", 4).count() == 0


# --- double-typed radix quantiles (round 6, VERDICT r5 item 3) ----------


def _ref_bits(x):
    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        ordered_bits_reference,
    )

    return ordered_bits_reference(x)


def test_double_ordered_bits_matches_struct_reference(spark):
    import math
    import struct

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        double_ordered_bits,
        ordered_bits_to_double,
    )

    # hand-picked adversarial set: ±0, subnormal extremes, the
    # normal/subnormal boundary, exact powers of two (the floor(log2)
    # off-by-one hazard), max/min normals, infinities, NaN, and
    # garden-variety values
    vals = [
        0.0, -0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5, 1.5, -2.25,
        5e-324, -5e-324, 2.0**-1074, 2.0**-1022, -(2.0**-1022),
        math.nextafter(2.0**-1022, 0.0),      # largest subnormal
        math.nextafter(2.0**-1022, 1.0),      # smallest normal + ulp
        2.0**-1023, 2.0**52, 2.0**53, 2.0**63, 2.0**1023,
        -(2.0**1023), 1.7976931348623157e308, -1.7976931348623157e308,
        math.nextafter(1.0, 2.0), math.nextafter(1.0, 0.0),
        float("inf"), float("-inf"), float("nan"),
        3.141592653589793, -2.718281828459045, 1e-300, -1e308,
    ] + [math.ldexp(1.0, k) for k in range(-1074, 1024, 97)] \
      + [-math.ldexp(1.0, k) for k in range(-1074, 1024, 101)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["b"]
        for r in df.select(double_ordered_bits(F.col("v")).alias("b"))
        .collect()
    ]
    for x, g in zip(vals, got):
        assert g == _ref_bits(x), (x, g, _ref_bits(x), struct.pack("<d", x))
        # exact roundtrip (±0.0 normalize to +0.0; NaN→NaN)
        back = ordered_bits_to_double(g)
        if math.isnan(x):
            assert math.isnan(back)
        else:
            assert back == x or (x == 0.0 and back == 0.0)
    # order preservation end-to-end, NaN greatest
    finite_sorted = sorted(v for v in vals if not math.isnan(v))
    mapped = [_ref_bits(v) for v in finite_sorted]
    assert mapped == sorted(mapped)
    assert _ref_bits(float("nan")) > _ref_bits(float("inf"))


def test_double_ordered_bits_hypothesis(spark):
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        ordered_bits_reference,
        ordered_bits_to_double,
    )

    # the Spark expression is checked against the struct reference in
    # the test above on an adversarial grid; here hypothesis hammers
    # the reference/inverse pair across the full bit space (driver
    # side — per-example Spark jobs would take minutes)
    @given(
        st.floats(
            allow_nan=True, allow_infinity=True, allow_subnormal=True
        )
    )
    @settings(max_examples=2000, deadline=None)
    def check(x):
        b = ordered_bits_reference(x)
        back = ordered_bits_to_double(b)
        if math.isnan(x):
            assert math.isnan(back)
        elif x == 0.0:
            assert back == 0.0
        else:
            assert back == x

    check()

    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=True,
                      allow_subnormal=True),
            min_size=2, max_size=50,
        )
    )
    @settings(max_examples=500, deadline=None)
    def check_order(xs):
        xs = sorted(xs)
        bs = [ordered_bits_reference(x) for x in xs]
        assert bs == sorted(bs)

    check_order()


def test_exact_quantiles_radix_double_column(spark):
    import random

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        exact_quantiles_radix,
    )

    rnd = random.Random(6)
    vals = (
        [rnd.uniform(-1e6, 1e6) for _ in range(997)]
        + [0.0, -0.0, 1e-310, -1e-310, 2.0**-1022, -2.0**300]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.01, 0.25, 0.5, 0.9, 0.999, 1.0]
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_radix(spark, df, "v", qs).collect()
    }
    s = sorted(vals)
    import math

    for q in qs:
        k = max(1, math.ceil(q * len(s) - 1e-9))
        assert got[q] == s[k - 1], (q, got[q], s[k - 1])
    # float column widens exactly
    fdf = spark.createDataFrame([(float(i),) for i in range(100)], "v float")
    out = exact_quantiles_radix(spark, fdf, "v", [0.5]).collect()[0]
    assert out["value"] == 49.0  # k = ceil(0.5*100) = 50th of 0..99


def test_exact_weighted_quantiles_double_column(spark):
    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        exact_weighted_quantiles_radix,
    )

    rows = [(-1.5, 1), (2.25, 3), (7.5, 6)]  # cum weights 1, 4, 10
    df = spark.createDataFrame(rows, "v double, w long")
    got = {
        r["quantile"]: r["value"]
        for r in exact_weighted_quantiles_radix(
            spark, df, "v", "w", [0.1, 0.4, 0.5, 1.0]
        ).collect()
    }
    assert got == {0.1: -1.5, 0.4: 2.25, 0.5: 7.5, 1.0: 7.5}


# --- double-typed equidepth binning (round 7, VERDICT r6 wrong #2) -------


def test_equidepth_double_matches_sorted_truth(spark):
    import math
    import random

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        equidepth_buckets,
    )

    rnd = random.Random(17)
    vals = (
        [rnd.uniform(-1e6, 1e6) for _ in range(500)]
        + [0.0, -0.0, 1e-310, -1e-310, -2.0**300, 2.0**-1022]
        + [0.25] * 40  # heavy tie straddling a cut
    )
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {
        r["bucket"]: r for r in equidepth_buckets(spark, df, "v", 4).collect()
    }
    # independent truth: cuts = lower order statistics, labels =
    # count of cuts strictly below (±0.0 compare equal)
    s = sorted(vals)
    n = len(s)
    cuts = [s[max(1, math.ceil(q * n - 1e-9)) - 1] for q in (0.25, 0.5, 0.75)]
    truth = {}
    for v in vals:
        b = sum(1 for c in cuts if c < v)
        t = truth.setdefault(b, [0, math.inf, -math.inf])
        t[0] += 1
        t[1] = min(t[1], v)
        t[2] = max(t[2], v)
    assert set(out) == set(truth)
    for b, (cnt, mn, mx) in truth.items():
        assert out[b]["n_rows"] == cnt, b
        assert out[b]["min_v"] == mn, b
        assert out[b]["max_v"] == mx, b
    # the schema carries genuine doubles
    assert dict(equidepth_buckets(spark, df, "v", 4).dtypes)["min_v"] == "double"


def test_equidepth_double_nan_ranks_greatest(spark):
    import math

    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        equidepth_buckets,
    )

    vals = [float(i) for i in range(8)] + [float("nan"), float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {
        r["bucket"]: r for r in equidepth_buckets(spark, df, "v", 2).collect()
    }
    # n=10 → cut = 5th lowest = 4.0; NaNs land above every cut
    assert rows[0]["n_rows"] == 5 and rows[0]["max_v"] == 4.0
    assert rows[1]["n_rows"] == 5
    assert math.isnan(rows[1]["max_v"])  # NaN is the bucket max


def test_equidepth_double_empty_schema_typed(spark):
    from nbi_oedi_etl_v2_spark.operators.order_stats import (
        equidepth_buckets,
    )

    empty = spark.createDataFrame([], "v double")
    out = equidepth_buckets(spark, empty, "v", 4)
    assert out.count() == 0
    assert dict(out.dtypes)["min_v"] == "double"
