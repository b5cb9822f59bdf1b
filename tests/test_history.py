"""SCD2 / CDC merge operator edge cases the orders-table workload
specs cannot exercise: multi-change keys (latest-wins), inserts of
unseen keys, deletes of absent keys, NULL tracked values."""

from __future__ import annotations

from nbi_oedi_etl_v2_spark.operators import history


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_scd2_runs_and_intervals(spark):
    hist = spark.createDataFrame(
        [
            # key 1: A A B A  → runs A[1,3) B[3,4) A[4,∞)
            (1, 1, "A"),
            (1, 2, "A"),
            (1, 3, "B"),
            (1, 4, "A"),
            # key 2: single row → one current run
            (2, 1, "X"),
        ],
        "k int, t int, v string",
    )
    out = history.scd2_from_history(
        hist, key_cols=["k"], order_col="t", tie_col="t", tracked_cols=["v"]
    )
    assert _rows(out) == [
        (1, "A", 1, 3, False),
        (1, "A", 4, None, True),
        (1, "B", 3, 4, False),
        (2, "X", 1, None, True),
    ]


def test_scd2_null_tracked_value_opens_run(spark):
    hist = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (1, 3, "A")], "k int, t int, v string"
    )
    out = history.scd2_from_history(
        hist, key_cols=["k"], order_col="t", tie_col="t", tracked_cols=["v"]
    )
    # NULL run opens at t=1 (row_number guard), stays one run through
    # t=2 (NULL eqNullSafe NULL), closes when A arrives
    assert _rows(out) == [(1, "A", 3, None, True), (1, None, 1, 3, False)]


def test_cdc_merge_latest_wins_insert_update_delete(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, payload string"
    )
    feed = spark.createDataFrame(
        [
            # key 1: update then delete — delete (seq 2) wins
            (1, "a2", "U", 1),
            (1, "a2", "D", 2),
            # key 2: two updates — seq 2 wins
            (2, "b1", "U", 1),
            (2, "b2", "U", 2),
            # key 4: insert of a key absent from the snapshot
            (4, "d", "U", 1),
            # key 5: delete of a key absent from the snapshot → no-op
            (5, "x", "D", 1),
        ],
        "k int, payload string, op string, seq int",
    )
    out = history.cdc_merge(snap, feed, key_cols=["k"])
    assert _rows(out) == [(2, "b2"), (3, "c"), (4, "d")]


def test_cdc_merge_seq_tie_is_deterministic(spark):
    snap = spark.createDataFrame([(1, "a")], "k int, payload string")
    feed = spark.createDataFrame(
        [(1, "new", "U", 7), (1, "new", "D", 7)],
        "k int, payload string, op string, seq int",
    )
    # same seq: op desc → 'U' > 'D' → update wins, deterministically
    out = history.cdc_merge(snap, feed, key_cols=["k"])
    assert _rows(out) == [(1, "new")]
