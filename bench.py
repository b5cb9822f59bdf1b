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
    # …and the streaming path once: the RocksDB state store pays a
    # one-time native-library + state-dir init (~0.5 s) on its first
    # micro-batch, which otherwise lands in the first timed sample and
    # skews the median (this was most of BENCH_r03's apparent
    # streaming regression — steady-state RocksDB ≈ heap provider).
    workload.all_specs()["streaming_hourly_downsample"].fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name, fn in workload.headline_queries().items():
        timings[name] = _median_time(lambda: fn(spark, SF_DIR).count(), name)

    # state-store A/B tail (VERDICT r3 item 3): the same streaming
    # query under the heap-backed provider, so every BENCH_r{N}.json
    # records what the scale-correct RocksDB default costs locally.
    _PROVIDERS = {
        "rocksdb": "org.apache.spark.sql.execution.streaming.state."
                   "RocksDBStateStoreProvider",
        "hdfs": "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider",
    }
    _SS_KEY = "spark.sql.streaming.stateStore.providerClass"
    _prior = spark.conf.get(_SS_KEY)
    state_store_ab: dict[str, float] = {}
    _stream_fn = workload.all_specs()["streaming_hourly_downsample"].fn
    try:
        for _label, _cls in _PROVIDERS.items():
            spark.conf.set(_SS_KEY, _cls)
            _stream_fn(spark, SF_DIR).count()  # provider init outside timer
            state_store_ab[_label] = _median_time(
                lambda: _stream_fn(spark, SF_DIR).count(),
                f"streaming_hourly_downsample[{_label}]",
            )
    finally:
        spark.conf.set(_SS_KEY, _prior)

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
                "state_store_ab": state_store_ab,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
