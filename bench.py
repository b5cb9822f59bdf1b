"""Benchmark harness: runs the headline workload queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + fetch-count); the
session is created once and reused (BASELINE.md notes per-query JVM
startup is the main local-mode risk).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nbi_oedi_etl_v2_spark import workload  # noqa: E402
from nbi_oedi_etl_v2_spark.operators.downsample import downsample  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402
from nbi_oedi_etl_v2_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    # the reference's headline number IS an ETL run (BASELINE.md:
    # 564.64 s for 1,128 files ≈ 2 files/s): time the equivalent
    # read → hourly downsample → snappy parquet write end-to-end.
    out = tempfile.mkdtemp(prefix="bench_etl_")
    try:
        t0 = time.perf_counter()
        hourly = downsample(
            load_table(spark, SF_DIR, "events"), timestamp_col="ts", entity_col="user_id"
        )
        hourly.write.mode("overwrite").parquet(out)
        timings["etl_write_pipeline"] = round(time.perf_counter() - t0, 4)
        print(f"# etl_write_pipeline: {timings['etl_write_pipeline']:.3f}s", file=sys.stderr)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline query wall time, warm session",
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
