"""Compare two bench JSON files and classify per-query drift.

Usage:
    python tools/bench_drift.py OLD.json NEW.json [--bar 0.15]

Accepts either raw ``bench.py`` output or the driver's
``BENCH_r{N}.json`` wrapper (looks under ``parsed`` when present).
Prints one line per common query with the relative delta, and a
summary splitting the common-set total. Queries beyond ``--bar`` in
either direction are flagged; with ``spread`` data present (round-5
bench format) a flag is downgraded to ``noise?`` when the two runs'
min-max envelopes overlap — i.e. the medians differ by less than the
runs' own jitter.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--bar", type=float, default=0.15)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    common = [k for k in oq if k in nq]
    if not common:
        print("no common queries", file=sys.stderr)
        return 1

    flagged = 0
    for k in common:
        rel = nq[k] / oq[k] - 1
        mark = ""
        if abs(rel) > args.bar:
            mark = "REGRESSED" if rel > 0 else "improved"
            o_s, n_s = osp.get(k), nsp.get(k)
            if o_s and n_s and n_s["min"] <= o_s["max"] and o_s["min"] <= n_s["max"]:
                mark += " noise? (spread envelopes overlap)"
            if rel > args.bar:
                flagged += 1
        print(f"{k:34s} {oq[k]:8.3f} -> {nq[k]:8.3f}  {rel:+7.1%}  {mark}")

    o_tot = sum(oq[k] for k in common)
    n_tot = sum(nq[k] for k in common)
    print(
        f"\ncommon-set total: {o_tot:.2f} -> {n_tot:.2f} "
        f"({n_tot / o_tot - 1:+.1%}); {flagged} above the +{args.bar:.0%} bar"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
