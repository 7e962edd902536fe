#!/usr/bin/env python
"""Merge N fresh-JVM BENCH_LOCAL.json copies into the round pin:
per-query MIN (episodic host stalls poison anything but best-of-N),
per-throughput-line MAX (higher MB/s = the machine's capability), and
a final-pin MOVER AUDIT against every prior round's committed pin —
any line >1.5x its best prior pinned value is listed for adjudication
(the standing zero-tolerance ritual).

Usage: python scripts/pin_bench.py OUT.json RUN1.json RUN2.json ...
"""

from __future__ import annotations

import glob
import json
import os
import sys


def is_throughput(key: str) -> bool:
    # "recall_at" catches every recall-FRACTION line
    # (ann_*_recall_at3_*) without swallowing the bare
    # ann_ivf_recall / ann_rp_recall keys, which are wall-time query
    # lines — the r15 "recall" substring MAXed those two in pins and
    # dropped them from totals (fixed in the r15 optimization round;
    # see OPTIMIZATION_r15.md).
    return key.endswith(("_MBps", "_GBps", "_rows_per_sec")) or "recall_at" in key


def is_metadata(key: str) -> bool:
    """Non-timing lines carried in the queries dict (scaling exponents
    merged from SCALING_LOCAL, counters) — constant across the runs
    being merged and meaningless to audit as wall-time movers."""
    return key.startswith("scaling_") or key.endswith("_n") or key.startswith(
        "printed_"
    )


def main() -> None:
    out_path, runs = sys.argv[1], sys.argv[2:]
    datas = [json.load(open(p)) for p in runs]
    base = datas[0]
    merged = dict(base)
    qs: dict = {}
    for d in datas:
        for k, v in d.get("queries", {}).items():
            if not isinstance(v, (int, float)):
                qs[k] = v
                continue
            if k not in qs or not isinstance(qs[k], (int, float)):
                qs[k] = v
            elif is_throughput(k):
                qs[k] = max(qs[k], v)
            else:
                qs[k] = min(qs[k], v)
    merged["queries"] = qs
    # r16: non-duration lines (recall fractions, *_MBps/*_GBps,
    # counters) live in a separate top-level "metrics" map now —
    # merge it too (MAX for throughputs = machine capability; recall
    # fractions and counters are run-invariant, last wins)
    ms: dict = {}
    for d in datas:
        for k, v in d.get("metrics", {}).items():
            if isinstance(v, (int, float)) and isinstance(
                ms.get(k), (int, float)
            ) and is_throughput(k):
                ms[k] = max(ms[k], v)
            else:
                ms[k] = v
    merged["metrics"] = ms
    merged["conditions"] = dict(base.get("conditions") or {})
    merged["conditions"]["pin"] = f"min of {len(runs)} fresh-JVM sweeps"
    merged["value"] = round(
        sum(
            v
            for k, v in qs.items()
            if isinstance(v, (int, float))
            and not is_throughput(k)
            and not is_metadata(k)
        ),
        3,
    )
    # mover audit vs every committed prior pin
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best_prior: dict = {}
    for p in sorted(glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))):
        try:
            pq = json.load(open(p)).get("queries", {})
        except Exception:
            continue
        for k, v in pq.items():
            if isinstance(v, (int, float)) and not is_throughput(k):
                if k not in best_prior or v < best_prior[k]:
                    best_prior[k] = v
    movers = []
    for k, v in qs.items():
        if (
            isinstance(v, (int, float))
            and not is_throughput(k)
            and not is_metadata(k)
            and k in best_prior
            and best_prior[k] > 0.05  # sub-50ms lines are pure noise
            and v > 1.5 * best_prior[k]
        ):
            movers.append(
                {"line": k, "pinned": v, "best_prior": best_prior[k],
                 "ratio": round(v / best_prior[k], 2)}
            )
    merged["final_pin_mover_audit"] = {
        "threshold": 1.5,
        "vs": "best prior committed BENCH_LOCAL_r*.json",
        "movers": sorted(movers, key=lambda m: -m["ratio"]),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"pinned {len(qs)} lines from {len(runs)} runs -> {out_path}")
    print(f"movers >1.5x vs best prior: {len(movers)}")
    for m in merged["final_pin_mover_audit"]["movers"]:
        print(" ", m)


if __name__ == "__main__":
    main()
