"""Dump ``explain("formatted")`` for headline queries to plans/<round>/.

Usage:
    python tools/capture_plans.py <suffix> [--final] [name ...]

Writes plans/<round>/<query>_<suffix>.txt for each named headline
query (default: all); the round directory comes from
``$SPARK_GRAFT_PLANS_DIR`` (default ``r11``). Without ``--final``
this is planning only — no job is executed. With ``--final`` the
query's OWN QueryExecution is executed (its executedPlan's RDD is
counted — no rows reach Python) and the FINAL adaptive plan is
dumped (AQE runtime exchange reuse, skew splits and join rewrites
are only visible there — guide §7.2). ADVICE r10 medium: the old
form wrote the noop sink, which runs a SEPARATE QueryExecution, so
``df._jdf.queryExecution()`` was never executed and every "--final"
dump still said ``isFinalPlan=false``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbi_oedi_etl_v2_spark import workload  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"),
)


def main() -> None:
    argv = sys.argv[1:]
    final = "--final" in argv
    if final:
        argv.remove("--final")
    suffix = argv[0] if argv else "before"
    only = set(argv[1:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    headline = workload.headline_queries()
    for name, fn in headline.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            if final:
                # Execute THIS df's QueryExecution so the adaptive
                # plan finalizes (isFinalPlan=true). A noop write
                # would run a separate QueryExecution and leave this
                # one un-executed (ADVICE r10). The RDD count stays
                # JVM-side — no rows cross to Python.
                df._jdf.queryExecution().executedPlan().execute().count()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
