"""Interleaved same-session ABA for the r10 ``copurchase_edges``
rewrite, pagerank consumer only (VERDICT r10 item 1: the driver showed
part_copurchase_pagerank 4.82 -> 7.14 s after the in-row rewrite while
kcore/labelprop held; the builder committed no pagerank-specific ABA).

Runs ``pagerank_fixed`` over BOTH edge constructions — the r10 in-row
collect_set form (graph.copurchase_edges) and the r9
distinct -> self-join -> distinct form (inlined below, verbatim from
510534a) — alternating A/B in ONE session, so session noise and JVM
warm-up hit both arms equally (the bench_focus methodology). Verifies
result equality once before timing.

    python tools/ab_pagerank_edges.py [--reps N]
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

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from nbi_oedi_etl_v2_spark.operators import graph  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402
from nbi_oedi_etl_v2_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """The r9 (510534a) form: distinct -> self-join on the order key
    -> distinct. Emits the identical edge set."""
    a = lineitem.select(
        F.col(f"`{order_col}`").alias("o"),
        F.col(f"`{item_col}`").alias("src"),
    ).distinct()
    b = a.select(F.col("o"), F.col("src").alias("dst"))
    return (
        a.join(b, "o")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def main() -> None:
    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark(app_name="ab-pagerank-edges")
    spark.sparkContext.setLogLevel("WARN")
    li = load_table(spark, SF_DIR, "lineitem")

    def force(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    def run_new() -> None:
        force(graph.pagerank_fixed(graph.copurchase_edges(li), iterations=5))

    def run_old() -> None:
        force(graph.pagerank_fixed(old_copurchase_edges(li), iterations=5))

    # result equality, once (both edge constructions are proven
    # identical sets, so fixed-point ranks must match bit-for-bit)
    r_new = sorted(
        map(tuple, graph.pagerank_fixed(
            graph.copurchase_edges(li), iterations=5
        ).collect())
    )
    r_old = sorted(
        map(tuple, graph.pagerank_fixed(
            old_copurchase_edges(li), iterations=5
        ).collect())
    )
    assert r_new == r_old, "edge constructions disagree!"
    print(f"# results equal ({len(r_new)} rows)", file=sys.stderr)

    run_new()  # warm both shapes once
    run_old()
    a, b = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        run_new()
        a.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_old()
        b.append(time.perf_counter() - t0)
        print(
            f"# rep {i}: new={a[-1]:.3f} old={b[-1]:.3f}", file=sys.stderr
        )
    out = {
        "sf_dir": SF_DIR,
        "new_inrow": {
            "med": round(statistics.median(a), 4),
            "min": round(min(a), 4),
            "max": round(max(a), 4),
        },
        "old_selfjoin": {
            "med": round(statistics.median(b), 4),
            "min": round(min(b), 4),
            "max": round(max(b), 4),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
