"""Attribution probe for the 8-vs-32-core small-SF inversion
(VERDICT r10 item 7: customer_bloom_inactive 0.46, embeddings_
kmeans_lloyd 0.47, multimodal_decode_jpeg 0.49 low/high ratios — the
driver's 8-core control ran them FASTER than the 32-core run, and the
verdict demands a written attribution before anyone tunes configs).

Runs the named keys in ONE session at ``local[$SPARK_GRAFT_CPUS]``
(the bench's own session settings via get_spark, but with the UI on
so the REST API exposes stage metrics) and reports, per key and rep:
wall seconds, job/stage/task counts, summed executor run time,
summed executor CPU time, and summed JVM GC time across the key's
stages. Compare a CPUS=8 run against a CPUS=32 run:

- if sum(executorRunTime) is similar at both widths but wall is
  worse at 32, the inversion is scheduling/latency overhead on
  tiny tasks (more, smaller tasks each paying fixed cost);
- if sum(executorRunTime) itself inflates at 32, the 32 concurrent
  tasks contend (memory bandwidth / GC) — look at cpuTime vs runTime
  and gcTime.

    SPARK_GRAFT_CPUS=8  python tools/probe_core_scaling.py key...
    SPARK_GRAFT_CPUS=32 python tools/probe_core_scaling.py key...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from nbi_oedi_etl_v2_spark import workload  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main() -> None:
    keys = sys.argv[1:] or [
        "customer_bloom_inactive",
        "embeddings_kmeans_lloyd",
        "multimodal_decode_jpeg",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="probe-core-scaling",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = workload.all_specs()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    app_id = _rest("/applications")[0]["id"]

    def stage_ids() -> set[int]:
        return {
            s["stageId"]
            for s in _rest(f"/applications/{app_id}/stages")
        }

    # warm-up (bench parity)
    force(specs["q1_pricing_summary"].fn(spark, SF_DIR))

    out = {"cpus": cpus, "sf_dir": SF_DIR, "keys": {}}
    for name in keys:
        spec = specs[name]
        fn = spec.bench_fn or spec.fn
        force(fn(spark, SF_DIR))  # warm
        walls, rows = [], []
        for _ in range(3):
            before = stage_ids()
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            walls.append(time.perf_counter() - t0)
            time.sleep(0.3)
            stages = [
                s
                for s in _rest(f"/applications/{app_id}/stages")
                if s["stageId"] not in before
                and s["status"] == "COMPLETE"
            ]
            rows.append(
                {
                    "stages": len(stages),
                    "tasks": sum(s["numCompleteTasks"] for s in stages),
                    "run_ms": sum(s["executorRunTime"] for s in stages),
                    "cpu_ms": sum(
                        s.get("executorCpuTime", 0) for s in stages
                    )
                    // 1_000_000,
                    "gc_ms": sum(s.get("jvmGcTime", 0) for s in stages),
                }
            )
        mid = sorted(range(3), key=lambda i: walls[i])[1]
        out["keys"][name] = {
            "wall_med": round(statistics.median(walls), 3),
            "walls": [round(w, 3) for w in walls],
            **rows[mid],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
