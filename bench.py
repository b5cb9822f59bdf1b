"""Benchmark harness: runs the headline workload queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + fetch-count) and
reported as the MEDIAN of ``$SPARK_GRAFT_REPS`` (default 3) in-process
repeats: at this scale first-execution codegen dominates and run-to-run
noise is 15-23 s across the suite, so medians are what make
round-over-round deltas meaningful. The session is created once and
reused (BASELINE.md notes per-query JVM startup is the main local-mode
risk).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nbi_oedi_etl_v2_spark import workload  # noqa: E402
from nbi_oedi_etl_v2_spark.operators.downsample import downsample  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402
from nbi_oedi_etl_v2_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))


def _median_time(run, label: str) -> float:
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    med = round(statistics.median(samples), 4)
    spread = ", ".join(f"{s:.3f}" for s in samples)
    print(f"# {label}: median {med:.3f}s of [{spread}]", file=sys.stderr)
    return med


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="nbi-oedi-etl-v2-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session warm-up.
    warm = workload.REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    warm.count()

    timings: dict[str, float] = {}
    for name, fn in workload.headline_queries().items():
        timings[name] = _median_time(lambda: fn(spark, SF_DIR).count(), name)

    # the reference's headline number IS an ETL run (BASELINE.md:
    # 564.64 s for 1,128 files ≈ 2 files/s): time the equivalent
    # read → hourly downsample → snappy parquet write end-to-end.
    out = tempfile.mkdtemp(prefix="bench_etl_")

    def etl_run() -> None:
        hourly = downsample(
            load_table(spark, SF_DIR, "events"),
            timestamp_col="ts",
            entity_col="user_id",
        )
        hourly.write.mode("overwrite").parquet(os.path.join(out, "run"))

    try:
        timings["etl_write_pipeline"] = _median_time(etl_run, "etl_write_pipeline")
    finally:
        shutil.rmtree(out, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": (
                    f"headline query wall time, warm session, "
                    f"median of {REPS}"
                ),
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
