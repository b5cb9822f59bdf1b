"""Scale soak: time selected workload queries at the derived scale
factors (.scaledata/sf1, .scaledata/sf10 — see scale_data.py) under
the same noop-sink forcing bench.py uses.

Usage: python tools/soak.py <sf_dir> <query> [query ...] [--n 3]
Prints one JSON line per query: {"query": ..., "sf_dir": ...,
"min"/"med"/"max": seconds, "n": reps}.

Protocol (SCALE.md "Soak-protocol finding", round 7): at sf10+ run
ONE query per invocation — queries sharing a session contaminate each
other 5-10x (heap growth charges later queries; the first query pays
the cold page-cache read of multi-GB files). Fresh session per query,
n>=2, report the median; the min approximates the warm-cache cost.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv, args, n = sys.argv[1:], [], 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--n" or a.startswith("--n="):
            # exact-match the flag (ADVICE r6: a bare prefix test
            # swallowed any --n* token and crashed on `--n3` / a
            # valueless `--n`)
            if "=" in a:
                val, i = a.split("=", 1)[1], i + 1
            else:
                if i + 1 >= len(argv):
                    raise SystemExit("--n requires a value")
                val, i = argv[i + 1], i + 2
            n = int(val)
        else:
            args.append(a)
            i += 1
    sf_dir, names = args[0], args[1:]

    from nbi_oedi_etl_v2_spark.session import get_spark
    from nbi_oedi_etl_v2_spark import workload
    import bench

    spark = get_spark()
    specs = workload.all_specs()
    for name in names:
        spec = specs[name]
        fn = spec.bench_fn or spec.fn
        ts = []
        for _ in range(n):
            t0 = time.monotonic()
            bench._force(fn(spark, sf_dir))
            ts.append(round(time.monotonic() - t0, 4))
        print(json.dumps({
            "query": name,
            "sf_dir": sf_dir,
            "min": min(ts),
            "med": round(statistics.median(ts), 4),
            "max": max(ts),
            "n": n,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
