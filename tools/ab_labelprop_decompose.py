"""Component decomposition for the r11 labelprop fusion: the full
fusion won at sf0.1 (7.13 -> 4.92 med) but LOST at sf1 (13.68 vs
15.05), so one of the components must scale badly. Three arms,
interleaved in one session:

    A  old r10 loop (struct argmax, SMJ update, early-exit job)
    B  bc-best + Observation early-exit, struct argmax kept
    C  bc-best + Observation + decimal-packed HashAgg argmax (= HEAD)

    python tools/ab_labelprop_decompose.py [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, Observation, functions as F  # noqa: E402

from nbi_oedi_etl_v2_spark.operators import graph  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402
from nbi_oedi_etl_v2_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_DECIMAL_ARGMAX = (
    "CAST(9223372036854775807 - CAST("
    "max(CAST(c AS DECIMAL(38,0))"
    " * CAST(9223372036854775808 AS DECIMAL(38,0))"
    " + (CAST(9223372036854775807 AS DECIMAL(38,0))"
    " - CAST(lbl AS DECIMAL(38,0))))"
    " % CAST(9223372036854775808 AS DECIMAL(38,0))"
    " AS DECIMAL(38,0)) AS BIGINT)"
)


def lp(
    edges: DataFrame,
    rounds: int,
    bc_best: bool,
    obs_exit: bool,
    dec_argmax: bool,
) -> DataFrame:
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
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
        labels.count()
        repart = cache.repartition("dst").persist()
        repart.count()
        cache.unpersist()
        e = repart
        for _rnd in range(rounds):
            neigh = (
                e.join(F.broadcast(labels), e["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"), "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            if dec_argmax:
                best = neigh.groupBy("node").agg(
                    F.expr(_DECIMAL_ARGMAX).alias("new_lbl")
                )
            else:
                best = neigh.groupBy("node").agg(
                    (-F.max(
                        F.struct(F.col("c"), (-F.col("lbl")).alias("n"))
                    )["n"]).alias("new_lbl")
                )
            best_side = F.broadcast(best) if bc_best else best
            upd = labels.join(best_side, "node", "left").select(
                "node",
                F.coalesce("new_lbl", "lbl").alias("lbl"),
                (~F.coalesce("new_lbl", "lbl").eqNullSafe(F.col("lbl")))
                .cast("int")
                .alias("_chg"),
            )
            if obs_exit:
                obs = Observation()
                labels = upd.observe(
                    obs, F.sum("_chg").alias("chg")
                ).localCheckpoint()
                if (obs.get["chg"] or 0) == 0:
                    break
            else:
                labels = upd.localCheckpoint()
                if (labels.agg(F.sum("_chg")).first()[0] or 0) == 0:
                    break
            labels = labels.drop("_chg")
        return labels.select("node", F.col("lbl").alias("community"))
    finally:
        cache.unpersist()
        if repart is not None:
            repart.unpersist()


ARMS = {
    "A_old": dict(bc_best=False, obs_exit=False, dec_argmax=False),
    "B_obs": dict(bc_best=False, obs_exit=True, dec_argmax=False),
    "C_obs_dec": dict(bc_best=False, obs_exit=True, dec_argmax=True),
    "D_full_bc": dict(bc_best=True, obs_exit=True, dec_argmax=True),
}


def main() -> None:
    argv = sys.argv[1:]
    reps = 5
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps, i = int(argv[i + 1]), i + 2
        else:
            i += 1
    spark = get_spark(app_name="ab-labelprop-decompose")
    spark.sparkContext.setLogLevel("WARN")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )

    def run(flags) -> DataFrame:
        return lp(
            graph.copurchase_edges(li), rounds=5, **flags
        ).orderBy("node")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    ref = run(ARMS["A_old"])
    for name, flags in ARMS.items():
        if name == "A_old":
            continue
        d = ref.exceptAll(run(flags)).count() + run(flags).exceptAll(ref).count()
        print(f"# {name} equal to A_old: {d == 0}")
        if d != 0:
            sys.exit(f"{name} DIFFERS")

    for flags in ARMS.values():
        force(run(flags))  # warm-up
    sinks = {k: [] for k in ARMS}
    for r in range(reps):
        line = [f"# rep {r}:"]
        for name, flags in ARMS.items():
            spark.sparkContext.setJobDescription(f"{name}-rep{r}")
            t0 = time.perf_counter()
            force(run(flags))
            sinks[name].append(round(time.perf_counter() - t0, 4))
            line.append(f"{name}={sinks[name][-1]}")
        print(" ".join(line))
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "reps": reps,
                **{
                    k: {
                        "med": round(statistics.median(v), 4),
                        "min": min(v),
                        "max": max(v),
                        "all": v,
                    }
                    for k, v in sinks.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
