"""Interleaved same-session ABA for the r10 widen sites in
operators/similarity.py (VERDICT r10 item 2: embedding_semantic_dedup
-27% and similarity_topk flat after `widen_narrow_input` was applied
ahead of cosine scoring; the builder's own minhash/ngram experiment
showed widening LOSES when per-row work is small and was reverted
there — apply the same standard here).

Patches ``operators._scale.widen_narrow_input`` to identity for the
"off" arm (the operators import it inside the function body, so the
patch takes effect per call), alternating A/B in ONE session. Verifies
result equality once (the widen is partitioning-invariant by design).

NOTE (r11): the measurement this tool produced led to REVERTING the
semantic_dedup widen (widen_on 2.58 vs widen_off 2.21 s med at
sf0.1, slower 6/7 reps; sf1 inside noise 20.64 vs 21.15 — the
cid-keyed pair join re-exchanges both sides, so the up-front
round-robin exchange is pure overhead, the minhash lesson). At HEAD
the semantic_dedup arm therefore measures identity-vs-identity; the
cosine_topk and pq_topk arms still toggle their KEPT widens
(plans/r11/AB_widen_similarity_kept_sites.json: cosine 0.47 on vs
0.60 off, pq 1.52 on vs 2.06 off).

    python tools/ab_widen_similarity.py [--reps N] [keys...]
    keys: semantic_dedup cosine_topk pq_topk (default all)
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

from nbi_oedi_etl_v2_spark import workload  # noqa: E402
from nbi_oedi_etl_v2_spark.operators import _scale  # noqa: E402
from nbi_oedi_etl_v2_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_REAL_WIDEN = _scale.widen_narrow_input

SPEC_KEYS = {
    "semantic_dedup": "embedding_semantic_dedup",
    "cosine_topk": "similarity_topk",
    "pq_topk": "similarity_topk_pq",
}


def main() -> None:
    argv = sys.argv[1:]
    reps = 7
    keys = []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps, i = int(argv[i + 1]), i + 2
        else:
            keys.append(argv[i])
            i += 1
    keys = keys or list(SPEC_KEYS)
    spark = get_spark(app_name="ab-widen-similarity")
    spark.sparkContext.setLogLevel("WARN")
    specs = workload.all_specs()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for key in keys:
        fn = specs[SPEC_KEYS[key]].fn

        def run(widen: bool) -> None:
            _scale.widen_narrow_input = (
                _REAL_WIDEN if widen else (lambda df: df)
            )
            try:
                force(fn(spark, SF_DIR))
            finally:
                _scale.widen_narrow_input = _REAL_WIDEN

        # equality check once
        _scale.widen_narrow_input = _REAL_WIDEN
        with_w = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        _scale.widen_narrow_input = lambda df: df
        without = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        _scale.widen_narrow_input = _REAL_WIDEN
        assert with_w == without, f"{key}: widen changed results!"
        print(f"# {key}: results equal ({len(with_w)} rows)", file=sys.stderr)

        run(True)  # warm both shapes
        run(False)
        on, off = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            run(True)
            on.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(False)
            off.append(time.perf_counter() - t0)
            print(
                f"# {key} rep {r}: widen_on={on[-1]:.3f} "
                f"widen_off={off[-1]:.3f}",
                file=sys.stderr,
            )
        out[key] = {
            "widen_on": {
                "med": round(statistics.median(on), 4),
                "min": round(min(on), 4),
                "max": round(max(on), 4),
            },
            "widen_off": {
                "med": round(statistics.median(off), 4),
                "min": round(min(off), 4),
                "max": round(max(off), 4),
            },
        }
    print(json.dumps({"sf_dir": SF_DIR, "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
