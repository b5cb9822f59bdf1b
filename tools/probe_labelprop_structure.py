"""Structure probe for label_propagation's per-round pipeline
(VERDICT r11 item 3 — measure BEFORE fusing): runs the headline
labelprop query once and reports, via the Spark status tracker, the
job count, stage count and total task count, plus the formatted plan
of ONE round's label-update step (the ``labels.join(best)`` chain) so
the join strategy and exchange count per round are visible.

    python tools/probe_labelprop_structure.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from nbi_oedi_etl_v2_spark.operators import graph  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402
from nbi_oedi_etl_v2_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="probe-labelprop-structure")
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )

    # warm the session so JVM/codegen startup does not pollute counts
    graph.copurchase_edges(li).count()

    tracker = sc.statusTracker()
    before_jobs = set(tracker.getJobIdsForGroup() or [])
    t0 = time.perf_counter()
    out = graph.label_propagation(graph.copurchase_edges(li), rounds=5)
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    time.sleep(0.5)
    jobs = [
        j
        for j in (tracker.getJobIdsForGroup() or [])
        if j not in before_jobs
    ]
    nstages = 0
    ntasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks >= 0:
                nstages += 1
                ntasks += si.numTasks
    print(
        f"labelprop sf={SF_DIR}: {dt:.2f}s, jobs={len(jobs)}, "
        f"stages~{nstages}, tasks~{ntasks}"
    )

    # one round's label-update step, isolated: same shapes as in the
    # loop (persisted dst-partitioned edges, checkpointed labels)
    e = (
        graph.copurchase_edges(li)
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .repartition("dst")
        .persist()
    )
    e.count()
    labels = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    neigh = (
        e.join(F.broadcast(labels), e["src"] == labels["node"])
        .groupBy(F.col("dst").alias("node"), "lbl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    best = neigh.groupBy("node").agg(
        (-F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("n")))["n"]).alias(
            "new_lbl"
        )
    )
    upd = labels.join(best, "node", "left").select(
        "node", F.coalesce("new_lbl", "lbl").alias("lbl")
    )
    print("\n=== one-round label update plan (current form) ===")
    upd.explain("formatted")
    e.unpersist()


if __name__ == "__main__":
    main()
