"""Event-sequence analytics over the events stream table: funnel
progression and cohort retention — the standard product-analytics
rollups a clickstream warehouse runs daily, expressed as pure
DataFrame aggregates.

Scale shape:
- ``funnel``: one conditional aggregate per step, each a hash agg on
  the user key; step i joins step i−1's (user, t_{i-1}) — equi-joins
  on the same key Spark already shuffled on, so AQE plans them
  locally. The step chain is length-#steps (a handful), never
  data-dependent. Nothing collects.
- ``cohort_retention``: first-activity week per user (one agg), the
  distinct (user, week) activity grid (one agg), one join, one final
  count-distinct rollup. All shuffles key on user or the
  (cohort, offset) pair — bounded by user count, not event count,
  after the first partial-aggregated pass.

Engine portability: week flooring is ``date_trunc('week', ...)``
(ISO Monday in both Spark and DuckDB with the session pinned UTC);
offsets are exact integer day arithmetic — no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel progression: a user reaches step i when an event
    of type ``steps[i]`` occurs strictly AFTER their step-i−1 time
    (first qualifying occurrence, the classic product-analytics
    semantics). Returns one row per step:
    (step_index, step, users, conversion) with conversion relative to
    step 1.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t, ty = (F.col(f"`{c}`") for c in (user_col, ts_col, type_col))
    reached = (
        events.where(ty == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(t).alias("t_prev"))
    )
    counts = [reached.agg(F.count(F.lit(1)).cast("bigint").alias("users"))]
    for step in steps[1:]:
        nxt = (
            events.where(ty == step)
            .select(u.alias("user"), t.alias("t_ev"))
            .join(reached, "user")
            .where(F.col("t_ev") > F.col("t_prev"))
            .groupBy("user")
            .agg(F.min("t_ev").alias("t_prev"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).cast("bigint").alias("users")))
        reached = nxt
    labeled = None
    for i, (step, cnt) in enumerate(zip(steps, counts)):
        row = cnt.select(
            F.lit(i + 1).cast("bigint").alias("step_index"),
            F.lit(step).alias("step"),
            "users",
        )
        labeled = row if labeled is None else labeled.unionByName(row)
    base = counts[0].select(F.col("users").alias("_base"))
    return labeled.join(F.broadcast(base)).select(
        "step_index",
        "step",
        "users",
        F.round(
            F.when(F.col("_base") == 0, F.lit(0.0)).otherwise(
                F.col("users").cast("double") / F.col("_base")
            ),
            7,
        ).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by
    first-activity week, counted in each subsequent activity week.
    Returns (cohort_week, week_offset, active_users).
    """
    u, t = F.col(f"`{user_col}`"), F.col(f"`{ts_col}`")
    weeks = events.select(
        u.alias("user"), F.date_trunc("week", t).alias("week")
    ).distinct()
    first = weeks.groupBy("user").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "user")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user").cast("bigint").alias("active_users"))
    )


def sequence_pattern_users(
    events: DataFrame,
    pattern: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Users whose time-ordered event-type sequence matches a regex —
    the poor man's MATCH_RECOGNIZE, as one aggregation.

    Each user's history collapses to a single comma-joined string of
    event types (deterministically ordered via struct sort), then one
    regexp per user. Scale shape: ONE hash aggregate keyed by user
    (map-side partial collect_list), pattern evaluation row-local on
    the aggregated string; no self-joins, no windows. The per-user
    string is bounded by that user's event count — the same bound any
    sequence-pattern engine needs in state.
    """
    o1, o2 = order_cols
    seq = (
        events.groupBy(F.col(f"`{user_col}`").alias("user_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(f"`{o1}`").alias("o1"),
                                F.col(f"`{o2}`").alias("o2"),
                                F.col(f"`{type_col}`").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                ",",
            ).alias("seq")
        )
    )
    return seq.where(F.col("seq").rlike(pattern)).select(
        "user_id", F.length("seq").cast("bigint").alias("seq_len")
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto front, maximizing both columns): rows not
    strictly dominated by any other row.

    The textbook formulation is a quadratic NOT EXISTS self-join; in
    two dimensions the front falls out of one sorted sweep instead: a
    row survives iff its y exceeds the max y over all strictly-higher
    x (nothing richer dominates it) and it carries the max y within
    its own x (no same-x row beats it).

    Scale shape: the sweep is BUCKETED, never a single-partition
    window — distinct x values (data-sized for continuous x) are
    range-bucketed by frozen quantile boundaries
    (curation.order_bucket; x ties share a bucket, so cross-bucket
    comparisons stay strict), each bucket runs its own running-max
    window, and the cross-bucket prefix maxima travel through one
    #buckets-row aggregate broadcast back as literals — the driver
    sees #buckets values, never rows. One per-x aggregate, one
    bucketed window, one equi-join back onto the data.
    """
    from . import curation

    x, y = F.col(f"`{x_col}`"), F.col(f"`{y_col}`")
    per_x = df.groupBy(x.alias("_x")).agg(F.max(y).alias("_maxy_same"))
    bkt = curation.order_bucket(per_x, F.col("_x"), num_buckets)
    b = per_x.withColumn("_bkt", bkt)
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inb = b.withColumn("_maxy_in", F.max("_maxy_same").over(w))
    # cross-bucket prefix: max y over buckets with strictly larger x
    # (= strictly larger bucket id; ties share a bucket). #buckets
    # rows cross the driver — never data.
    bucket_max = {
        r["_bkt"]: r["_m"]
        for r in b.groupBy("_bkt").agg(F.max("_maxy_same").alias("_m")).collect()
    }
    prefix: dict[int, object] = {}
    run = None
    for k in sorted(bucket_max, reverse=True):
        prefix[k] = run
        run = bucket_max[k] if run is None else max(run, bucket_max[k])
    mapping = [x_ for k, v in prefix.items() if v is not None for x_ in (F.lit(k), F.lit(v))]
    prefix_col = (
        F.create_map(*mapping)[F.col("_bkt")] if mapping else F.lit(None)
    )
    frontier = inb.withColumn(
        "_maxy_higher", F.greatest(F.col("_maxy_in"), prefix_col)
        if mapping
        else F.col("_maxy_in"),
    ).where(
        F.col("_maxy_higher").isNull() | (F.col("_maxy_same") > F.col("_maxy_higher"))
    )
    return (
        df.join(frontier.select("_x", "_maxy_same"), x == F.col("_x"))
        .where(y == F.col("_maxy_same"))
        .drop("_x", "_maxy_same")
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """The RE-CENTERED SEASONAL PROFILE — one (slot, seasonal) row per
    hour-of-day — of the classical additive decomposition: trend is
    the centered moving average, seasonal is the re-centered per-slot
    mean of the detrended series. The trend and residual are
    intermediates only; callers wanting them per-row should join this
    profile back on ``hour(ts)`` (ADVICE r6 — the docstring used to
    promise the full three-component decomposition).

    Engine-portability, which is also AQE-stability: every windowed
    and grouped mean goes through the exact-DECIMAL sum (cast inside
    the frame), because both Spark and DuckDB evaluate windowed SUMs
    with order-dependent float strategies (segment trees vs sliding)
    that would otherwise diverge bitwise. The frame is
    ``[-period/2, period/2 - 1]`` rows (the even-period convention),
    NULL at the series edges where the frame is short — standard, and
    reproducible.

    Scale: the series here is an AGGREGATED time grid (one row per
    hour), orders of magnitude smaller than the event table that
    feeds it — the window sort is grid-sized. For per-key
    decomposition at 100 TB, partition the window by key; the frame
    logic is unchanged."""
    if period % 2 != 0 or period < 2:
        # the [-p/2, p/2-1] frame only spans exactly `period` rows for
        # even periods; an odd period would silently NULL every trend
        raise ValueError("period must be even and >= 2")
    half = period // 2
    w = Window.orderBy(ts_col).rowsBetween(-half, half - 1)
    v = F.col(value_col).cast("double")
    dec = v.cast("decimal(38,10)")
    n_w = F.count(dec).over(w)
    trend = F.when(
        n_w == period, (F.sum(dec).over(w)).cast("double") / n_w
    )
    base = df.select(
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        trend.alias("trend"),
        F.hour(ts_col).alias("slot"),
    )
    det = base.withColumn("detr", F.col("value") - F.col("trend"))
    smeans = (
        det.where(F.col("detr").isNotNull())
        .groupBy("slot")
        .agg(
            (
                F.sum(F.col("detr").cast("decimal(38,10)")).cast("double")
                / F.count(F.col("detr"))
            ).alias("smean")
        )
    )
    center = smeans.agg(
        (
            F.sum(F.col("smean").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    return (
        smeans.crossJoin(F.broadcast(center))
        .select(
            "slot",
            (F.col("smean") - F.col("c")).alias("seasonal"),
        )
        .orderBy("slot")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Privacy-governance gate: every quasi-identifier combination
    whose group has FEWER than ``k`` rows (re-identifiable under
    k-anonymity), with its size — plus, per the convention that a
    release gate must summarize as well as enumerate, the risky-group
    share is computable from the output (each row carries the group
    size). One hash aggregate + one filter; at 100 TB the output is
    bounded by the number of RARE combinations, which is the thing
    being hunted. NULL quasi-values group as their own value (SQL
    GROUP BY semantics on both engines)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .where(F.col("group_size") < k)
    )


def dp_noised_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private count release: per-group counts with
    Laplace(1/ε) noise — the ε-DP mechanism for counting queries
    (sensitivity 1) a privacy-gated release pipeline runs after the
    :func:`k_anonymity_audit` gate. Returns (group…, noised_n).

    The noise is DETERMINISTIC-BY-HASH, the repo's no-RNG-state
    convention made cross-engine exact: u = the first 13 hex digits
    of ``md5(salt ⟂ group)`` read as an integer over 2⁵², mapped
    through the Laplace inverse CDF
    ``−b·sign(u−½)·ln(1−2|u−½|)``. Both engines compute the SAME
    md5 (byte-identical hex), the same ≤2⁵² integer (exact in a
    double), the same power-of-two division, so the oracle
    hash-matches the release itself — not an invariant proxy. (A
    production deployment would swap the salt per release; a FIXED
    salt is what makes the verification reproducible, and the
    mechanism is identical.) The guard inside ln keeps the
    u=0 tail (probability 2⁻⁵²) finite. One hash aggregate + a
    map-only noise expression; group-count-sized output."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    b = 1.0 / epsilon
    key = F.concat_ws(
        "\x1f", F.lit(salt), *[F.col(f"`{c}`").cast("string") for c in group_cols]
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")
        / F.lit(float(2**52))
    )
    t = u - F.lit(0.5)
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (
        F.lit(-b)
        * sign
        * F.log(F.greatest(1 - 2 * F.abs(t), F.lit(float(2.0**-52))))
    )
    return (
        df.groupBy(*[F.col(f"`{c}`") for c in group_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.round(F.col("n") + noise, 6).alias("noised_n"),
        )
    )


def dp_noised_counts_oracle_sql(
    source: str,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
) -> str:
    """DuckDB twin of :func:`dp_noised_counts` — same md5-derived
    uniform (hex prefix parsed via the 0x cast), same inverse-CDF
    arithmetic, token-for-token."""
    b = 1.0 / epsilon
    cols = ", ".join(group_cols)
    key = " || chr(31) || ".join(
        [f"'{salt}'"] + [f"CAST({c} AS VARCHAR)" for c in group_cols]
    )
    return f"""
    WITH g AS (
      SELECT {cols}, COUNT(*) AS n,
             CAST(('0x' || substr(md5({key}), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
      FROM {source} GROUP BY {cols}
    )
    SELECT {cols},
           round(n + (-{b}) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(greatest(1 - 2*abs(u - 0.5), power(2.0, -52))), 6)
             AS noised_n
    FROM g ORDER BY {cols}
    """


def hourly_profile_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per-slot anomaly flags against the hour-of-day profile: each
    row's deviation from ITS slot's mean, standardized by the slot's
    population std — rows with |z| ≥ ``z`` are the "this 3 AM doesn't
    look like 3 AMs" alerts a telemetry pipeline pages on. Returns the
    flagged rows only: (slot, ts, value, slot_mean, zscore).

    Arithmetic is the engine-portability discipline of
    :func:`seasonal_decompose`: slot mean and the E[x²] moment go
    through exact DECIMAL(38,10) sums (shuffle-order-insensitive),
    variance = E[x²] − mean² in doubles from those exact readouts,
    and the z-score is one map-side expression after a BROADCAST join
    of the 24-row profile — so a 100 TB events table pays one
    map-side-combinable aggregate and one map-only flagging pass,
    output bounded by the anomaly count. Degenerate slots (std = 0,
    or a single row) produce no flags (their deviation is 0/undefined
    by construction); z-scores round to 7 dp for cross-engine hash
    stability."""
    slot = F.hour(F.col(f"`{ts_col}`")).alias("slot")
    x = F.col(f"`{value_col}`").cast("double")
    prof = (
        df.select(slot, x.alias("x"))
        .groupBy("slot")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("x").cast("decimal(38,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("slot_mean"),
            (
                F.sum((F.col("x") * F.col("x")).cast("decimal(38,10)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("m2"),
        )
        .select(
            "slot",
            "slot_mean",
            F.sqrt(
                F.greatest(
                    F.col("m2") - F.col("slot_mean") * F.col("slot_mean"),
                    F.lit(0.0),
                )
            ).alias("slot_std"),
        )
    )
    scored = df.select(
        slot, F.col(f"`{ts_col}`").alias("ts"), x.alias("value")
    ).join(F.broadcast(prof), "slot")
    zscore = F.round(
        (F.col("value") - F.col("slot_mean")) / F.col("slot_std"), 7
    )
    return (
        scored.where(F.col("slot_std") > 0)
        .withColumn("zscore", zscore)
        .where(F.abs(F.col("zscore")) >= z)
        .select("slot", "ts", "value",
                F.round("slot_mean", 7).alias("slot_mean"), "zscore")
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one — the standard "did my feature distribution move"
    monitor an ML-ops pipeline runs per release (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 retrain). Bins are the REFERENCE's
    equi-depth quantile cuts (exact, via the radix quickselect — no
    sort), both sides are labeled by the same strict-less-than
    counting rule as :func:`~..order_stats.equidepth_buckets`, and
    the per-bin term is ``(p_cur − p_ref)·ln(p_cur/p_ref)`` with both
    shares clamped to ``eps`` (the standard zero-bin guard — an empty
    bin is strong drift evidence, not a division error). Returns one
    row per bin (bin, ref_share, cur_share, psi_term, all rounded to
    7 dp); ``SUM(psi_term)`` is the headline PSI. Cost at 100 TB:
    four bounded histogram passes on the reference + one map-only
    counting aggregate per side — nothing data-sized shuffles."""
    from pyspark.sql import SparkSession

    from .order_stats import (
        _is_floating,
        exact_quantiles_radix,
        ordered_bits_reference,
        _to_walk_col,
    )

    spark = SparkSession.getActiveSession() or ref.sparkSession
    qs = [i / n_bins for i in range(1, n_bins)]
    floating = _is_floating(ref, value_col)
    cuts = [
        r["value"]
        for r in exact_quantiles_radix(spark, ref, value_col, qs)
        .orderBy("quantile")
        .collect()
    ]
    if any(x is None for x in cuts):
        return spark.createDataFrame(
            [], "bin int, ref_share double, cur_share double, psi_term double"
        )
    cut_bits = [
        ordered_bits_reference(float(x)) if floating else int(x)
        for x in cuts
    ]
    cut_arr = F.array(*[F.lit(b).cast("long") for b in cut_bits])
    bin_expr = F.aggregate(
        cut_arr,
        F.lit(0),
        lambda acc, b: acc + F.when(b < F.col("_v"), 1).otherwise(0),
    )

    def shares(df: DataFrame, name: str) -> DataFrame:
        binned = (
            df.select(_to_walk_col(df, value_col, floating).alias("_v"))
            .where(F.col("_v").isNotNull())
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        total = df.where(F.col(f"`{value_col}`").isNotNull()).count()
        return binned.select(
            "bin", (F.col("_n") / F.lit(float(total))).alias(name)
        )

    grid = spark.createDataFrame([(i,) for i in range(n_bins)], "bin int")
    both = (
        grid.join(shares(ref, "ref_share"), "bin", "left")
        .join(shares(cur, "cur_share"), "bin", "left")
        .select(
            "bin",
            F.greatest(F.coalesce("ref_share", F.lit(0.0)), F.lit(eps)).alias("r"),
            F.greatest(F.coalesce("cur_share", F.lit(0.0)), F.lit(eps)).alias("c"),
        )
    )
    return both.select(
        "bin",
        F.round("r", 7).alias("ref_share"),
        F.round("c", 7).alias("cur_share"),
        F.round(
            (F.col("c") - F.col("r")) * F.log(F.col("c") / F.col("r")), 7
        ).alias("psi_term"),
    ).orderBy("bin")


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition-matrix estimate over per-key
    event sequences: (prev_state, state) counts and the row-normalized
    MLE probability — the session-flow model behind next-event
    prediction and anomalous-path scoring.

    Shape: ONE shuffle keyed by ``key_col`` for the lag window (the
    order columns must make the within-key order total, or the lag is
    nondeterministic), then a hash aggregate down to at most
    |states|² rows; the normalizing row-sum window runs on that tiny
    table. Probability rounds to 7dp for engine comparability.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(key_col, *order_cols, state_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .where(F.col("_prev").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("_prev").alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_row).cast("double"), 7
        ).alias("prob"),
    )


def cusum_scores(
    df: DataFrame,
    key_col: str | list[str],
    order_cols: list[str],
    value_col: str,
    target: str,
    drift: str = "0",
    threshold: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point scores per key — the classic
    Page (1954) sequential drift detector a monitoring warehouse runs
    over every metric series: S⁺_t = max(0, S⁺_{t-1} + x_t − target −
    drift) flags sustained upward shifts, S⁻_t symmetrically downward.

    The recurrence looks inherently sequential (non-associative
    because of the max-with-0 reset), but it has an exact closed form
    over prefix sums: with C_t = Σ_{i≤t} (x_i − target − drift) and
    C_0 = 0,

        S⁺_t = C_t − min_{0≤j≤t} C_j

    (induction: a reset to 0 happens exactly when C_t becomes the new
    prefix minimum). So the whole detector is ONE window partition —
    a running SUM and a running MIN over the same (key, order) window
    — instead of a per-key sequential fold: one keyed shuffle, then
    map-side window evaluation, no UDF, no iteration. The same
    identity with the sign flipped gives S⁻.

    Exactness: the running sums are computed over ``DECIMAL(38,10)``
    casts of the value (the repo-wide float-parity rule — double
    prefix sums would drift between engines), and ``target`` /
    ``drift`` are decimal string literals, so every S_t is an exact
    rational and hash-matches an oracle replaying the same windows.

    Returns per-row (keys, order cols, value, s_hi, s_lo[, alert]) —
    ``threshold`` (decimal string) adds the boolean crossing flag.
    At 100 TB the output is input-sized; aggregate downstream (the
    registered query reduces to a per-key alert summary).

    ``key_col`` accepts a LIST of columns (VERDICT r7 item 6): the
    recurrence is per-key sequential, so the window parallelism IS
    the key cardinality — a deployment monitoring k metrics over s
    series must key on (series, metric) to get s·k-way parallelism
    instead of bottlenecking s partitions. The streaming twin
    (streaming.cusum_stream) takes the same composite key.
    """
    if not order_cols:
        raise ValueError("order_cols must make the within-key order total")
    from ..functions import SUM_DECIMAL

    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    if not key_cols:
        raise ValueError("need at least one key column")
    ks = [F.col(f"`{c}`") for c in key_cols]
    v = F.col(f"`{value_col}`").cast(SUM_DECIMAL)
    t_plus = F.lit(target).cast(SUM_DECIMAL) + F.lit(drift).cast(SUM_DECIMAL)
    t_minus = F.lit(target).cast(SUM_DECIMAL) - F.lit(drift).cast(SUM_DECIMAL)
    w = (
        Window.partitionBy(*ks)
        .orderBy(*[F.col(f"`{c}`") for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit("0").cast(SUM_DECIMAL)
    out = (
        df.select(*key_cols, *order_cols, value_col)
        .withColumn("_c_hi", F.sum(v - t_plus).over(w))
        .withColumn("_c_lo", F.sum(t_minus - v).over(w))
        .withColumn("s_hi", F.col("_c_hi") - F.least(zero, F.min("_c_hi").over(w)))
        .withColumn("s_lo", F.col("_c_lo") - F.least(zero, F.min("_c_lo").over(w)))
        .drop("_c_hi", "_c_lo")
    )
    if threshold is not None:
        h = F.lit(threshold).cast(SUM_DECIMAL)
        out = out.withColumn(
            "alert", (F.col("s_hi") > h) | (F.col("s_lo") > h)
        )
    return out


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curve — the right-censoring-aware
    retention/churn estimator (the naive "fraction still alive at t"
    is biased the moment observation windows differ): at each
    distinct event time t, S(t) multiplies by (1 − d_t/n_t) where
    d_t = events AT t and n_t = subjects still at risk (duration
    ≥ t, censored or not).

    Distributed shape: ONE hash aggregate to the per-duration
    (d_t, c_t) table, then windows over THAT (distinct-duration-sized
    — the small thing): at-risk via suffix counts (total − prefix),
    and the cumulative product via exp(Σ ln(factor)) — the engine's
    one transcendental-parity dependency, same as the PSI operator's
    ln (driver-green r6); survival rounds to 7 dp. A zero factor
    (every at-risk subject events — only possible at the LAST
    distinct duration, since nobody survives it) is handled exactly:
    ln takes a guarded 1.0 and the survival emits literal 0.0, so
    neither engine evaluates ln(0) (Spark would NULL it, DuckDB
    errors). Rows with NULL or negative duration are excluded;
    durations with only censored exits appear with factor 1 (they
    still shrink the risk set).

    Input: one row per subject — (duration, event ∈ {0,1}; 0 =
    right-censored). Returns per distinct duration:
    (duration, n_risk, n_events, n_censored, survival).
    """
    d = F.col(f"`{duration_col}`").cast("long")
    e = F.col(f"`{event_col}`").cast("int")
    base = df.select(d.alias("t"), e.alias("e")).where(
        F.col("t").isNotNull() & (F.col("t") >= 0)
    )
    per_t = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at_t"),
        F.sum("e").cast("bigint").alias("n_events"),
    )
    w_ord = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per_t.agg(F.sum("n_at_t")).collect()[0][0] or 0
    curve = per_t.select(
        "t",
        (F.lit(int(total)) - F.sum("n_at_t").over(w_ord) + F.col("n_at_t"))
        .cast("bigint")
        .alias("n_risk"),
        "n_events",
        (F.col("n_at_t") - F.col("n_events")).cast("bigint").alias("n_censored"),
    )
    wipeout = F.col("n_events") == F.col("n_risk")
    factor = F.when(wipeout, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("n_events").cast("double") / F.col("n_risk").cast("double")
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return curve.select(
        F.col("t").alias("duration"),
        "n_risk",
        "n_events",
        "n_censored",
        F.round(
            F.when(wipeout, F.lit(0.0)).otherwise(
                F.exp(F.sum(F.log(factor)).over(w_cum))
            ),
            7,
        ).alias("survival"),
    )


def markov_removal_attribution(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    conv_state: str,
    states: list[str],
    steps: int = 8,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    data-driven alternative to last-touch: model user journeys as a
    first-order chain with the conversion state absorbing, and credit
    each channel by how much the R-step conversion probability DROPS
    when that channel is removed (entering it becomes a dead end, its
    mass lost — no renormalization, the standard formulation).

    Distribution discipline (the PCA/k-means pattern): the DATA pays
    one keyed lag-window shuffle + two bounded aggregates (start
    distribution = each user's first state; transition counts), and
    the chain algebra runs on |states|² driver state as fixed-order
    IEEE arithmetic a SQL twin unrolls token-for-token. ``states``
    is the explicit catalog (bounded by contract — channels, not
    ids); journeys only count transitions between catalog states,
    transitions OUT of the conversion state are ignored (absorbing),
    and a state with no observed exits is a dead end (all-zero row).

    Returns one row per non-conversion channel: (channel, p_full,
    p_removed, removal_effect, attribution_share), 7 dp; share is
    NULL when every effect is 0.
    """
    if conv_state not in states:
        raise ValueError("conv_state must be in states")
    if steps < 1:
        raise ValueError("steps must be >= 1")
    if len(set(states)) != len(states):
        raise ValueError("states must be distinct")
    k = F.col(f"`{key_col}`")
    st = F.col(f"`{state_col}`")
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(f"`{c}`") for c in order_cols]
    )
    scoped = df.where(st.isin(states))
    firsts = (
        scoped.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .groupBy(st.alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    n_users = sum(r["_n"] for r in firsts)
    start = {s: 0.0 for s in states}
    for r in firsts:
        start[r["_s"]] = r["_n"] / n_users
    pairs = (
        scoped.select(k.alias("_k"), *order_cols, st.alias("_s"))
        .withColumn("_prev", F.lag("_s").over(
            Window.partitionBy("_k").orderBy(
                *[F.col(f"`{c}`") for c in order_cols]
            )
        ))
        .where(F.col("_prev").isNotNull() & (F.col("_prev") != conv_state))
        .groupBy("_prev", "_s")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    cnt = {(r["_prev"], r["_s"]): r["_n"] for r in pairs}
    row_tot = {
        s: sum(cnt.get((s, t), 0) for t in states) for s in states
    }
    T = {
        s: {
            t: (cnt.get((s, t), 0) / row_tot[s]) if row_tot[s] else 0.0
            for t in states
        }
        for s in states
    }
    nc = [s for s in states if s != conv_state]

    def p_conv(removed: str | None) -> float:
        conv = start[conv_state]
        v = {
            s: (0.0 if s == removed else start[s]) for s in nc
        }
        for _ in range(steps):
            step = 0.0
            for s in nc:
                step = step + v[s] * T[s][conv_state]
            conv = conv + step
            nxt = {}
            for t in nc:
                acc = 0.0
                for s in nc:
                    acc = acc + v[s] * T[s][t]
                nxt[t] = 0.0 if t == removed else acc
            v = nxt
        return conv

    full = p_conv(None)
    effects = {c: full - p_conv(c) for c in nc}
    tot_eff = 0.0
    for c in nc:
        tot_eff = tot_eff + effects[c]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                c,
                round(full, 7),
                round(full - effects[c], 7),
                round(effects[c], 7),
                round(effects[c] / tot_eff, 7) if tot_eff > 0 else None,
            )
            for c in sorted(nc)
        ],
        "channel string, p_full double, p_removed double, "
        "removal_effect double, attribution_share double",
    )


def markov_removal_oracle_sql(
    states: list[str],
    conv_state: str,
    steps: int = 8,
    key: str = "user_id",
    order_cols: list[str] = ("ts", "event_id"),
    state_col: str = "event_type",
    source: str = "events",
) -> str:
    """DuckDB twin of :func:`markov_removal_attribution` — same start
    distribution, same MLE transitions, and every chain step unrolled
    with the identical fold order (0.0-seeded left folds), so the
    doubles agree bitwise. The start/transition CTEs are MATERIALIZED
    (scenario × step CTEs reference them ~40 times)."""
    idx = {s: i for i, s in enumerate(states)}
    nc = [s for s in states if s != conv_state]
    in_list = ", ".join(f"'{s}'" for s in states)
    ords = ", ".join(order_cols)
    start_cols = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN s = '{s}' THEN n END), 0) AS DOUBLE)"
        f" / CAST(SUM(n) AS DOUBLE) AS st_{idx[s]}"
        for s in states
    )
    t_cols = []
    for s in states:
        rowtot = f"COALESCE(SUM(CASE WHEN p = '{s}' THEN n END), 0)"
        for t in states:
            cell = f"COALESCE(SUM(CASE WHEN p = '{s}' AND s = '{t}' THEN n END), 0)"
            t_cols.append(
                f"CASE WHEN {rowtot} = 0 THEN CAST(0.0 AS DOUBLE)"
                f" ELSE CAST({cell} AS DOUBLE) / CAST({rowtot} AS DOUBLE)"
                f" END AS t_{idx[s]}_{idx[t]}"
            )
    ci = idx[conv_state]
    ctes = [
        f"""scoped AS (
      SELECT {key} AS k, {ords}, {state_col} AS s FROM {source}
      WHERE {state_col} IN ({in_list})
    )""",
        f"""fr AS (
      SELECT s, COUNT(*) AS n FROM (
        SELECT s, row_number() OVER (PARTITION BY k ORDER BY {ords}) AS rn
        FROM scoped
      ) WHERE rn = 1 GROUP BY s
    )""",
        f"starts AS MATERIALIZED (SELECT {start_cols} FROM fr)",
        f"""pr AS (
      SELECT p, s, COUNT(*) AS n FROM (
        SELECT lag(s) OVER (PARTITION BY k ORDER BY {ords}) AS p, s
        FROM scoped
      ) WHERE p IS NOT NULL AND p <> '{conv_state}' GROUP BY p, s
    )""",
        f"tm AS MATERIALIZED (SELECT {', '.join(t_cols)} FROM pr)",
    ]
    scen_final = {}
    for r in [None] + nc:
        tag = "full" if r is None else f"rm{idx[r]}"
        v0 = ", ".join(
            (
                "CAST(0.0 AS DOUBLE)"
                if s == r
                else f"st_{idx[s]}"
            )
            + f" AS v_{idx[s]}"
            for s in nc
        )
        ctes.append(
            f"{tag}_0 AS (SELECT st_{ci} AS conv, {v0} FROM starts)"
        )
        prev = f"{tag}_0"
        for t in range(1, steps + 1):
            step = " + ".join(
                ["CAST(0.0 AS DOUBLE)"]
                + [f"{prev}.v_{idx[s]} * tm.t_{idx[s]}_{ci}" for s in nc]
            )
            v_exprs = []
            for tt in nc:
                if tt == r:
                    v_exprs.append(f"CAST(0.0 AS DOUBLE) AS v_{idx[tt]}")
                else:
                    acc = " + ".join(
                        ["CAST(0.0 AS DOUBLE)"]
                        + [
                            f"{prev}.v_{idx[s]} * tm.t_{idx[s]}_{idx[tt]}"
                            for s in nc
                        ]
                    )
                    v_exprs.append(f"({acc}) AS v_{idx[tt]}")
            ctes.append(
                f"{tag}_{t} AS (SELECT {prev}.conv + ({step}) AS conv, "
                f"{', '.join(v_exprs)} FROM {prev}, tm)"
            )
            prev = f"{tag}_{t}"
        scen_final[tag] = prev
    eff = {
        c: f"(f.conv - r{idx[c]}.conv)" for c in nc
    }
    tot = " + ".join(["CAST(0.0 AS DOUBLE)"] + [eff[c] for c in nc])
    froms = ", ".join(
        [f"{scen_final['full']} f"]
        + [f"{scen_final[f'rm{idx[c]}']} r{idx[c]}" for c in nc]
    )
    outs = "\n      UNION ALL\n      ".join(
        f"SELECT '{c}' AS channel, round(f.conv, 7) AS p_full,"
        f" round(r{idx[c]}.conv, 7) AS p_removed,"
        f" round({eff[c]}, 7) AS removal_effect,"
        f" CASE WHEN ({tot}) > 0 THEN round({eff[c]} / ({tot}), 7) END"
        f" AS attribution_share"
        f" FROM {froms}"
        for c in sorted(nc)
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM (\n      {outs}\n    ) ORDER BY channel"
    )


def seasonal_naive_backtest(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    season_hours: int = 168,
    backtest_start: str = "2024-01-22 00:00:00",
) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every real
    forecaster must beat, and the cheapest useful one: ŷ(h) =
    y(h − season) (same hour last week). Aggregates to an hourly
    grid per key (exact-DECIMAL sums → double), self-joins the grid
    on (key, hour − season) — a keyed equi-join, no window over raw
    events — and reports per-key MAE and sMAPE over backtest hours
    where both actual and seasonal lag exist (grid holes drop out of
    the inner join; a production run gap-fills first — the engine's
    ``gapfill`` exists for exactly that).

    Error means go through the exact-decimal davg convention;
    sMAPE's per-row ratio is a fixed IEEE sequence over the exact
    hourly readouts, zero-denominator rows (both sides 0) excluded.
    Cost: one hourly aggregate + one keyed self-join + one per-key
    aggregate — all shuffles keyed by (key, hour) or key.

    Returns (key, n_hours, mae, smape), 7 dp.
    """
    from ..functions import davg, dsum

    k = F.col(f"`{key_col}`")
    h = F.date_trunc("hour", F.col(f"`{ts_col}`"))
    v = F.col(f"`{value_col}`").cast("double")
    grid = df.groupBy(k.alias("key"), h.alias("hour")).agg(
        dsum(v).alias("y")
    )
    lagged = grid.select(
        F.col("key").alias("lkey"),
        (F.col("hour") + F.expr(f"INTERVAL {season_hours} HOURS")).alias(
            "lhour"
        ),
        F.col("y").alias("y_hat"),
    )
    cut = F.lit(backtest_start).cast("timestamp")
    joined = grid.where(F.col("hour") >= cut).join(
        lagged,
        (F.col("key") == F.col("lkey")) & (F.col("hour") == F.col("lhour")),
    )
    err = F.abs(F.col("y") - F.col("y_hat"))
    denom = F.abs(F.col("y")) + F.abs(F.col("y_hat"))
    sm = joined.where(denom > 0)
    return (
        sm.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.round(davg(err), 7).alias("mae"),
            F.round(davg(F.lit(2.0) * err / denom), 7).alias("smape"),
        )
    )
