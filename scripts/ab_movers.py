"""Interleaved A/B for pinned-bench movers (r13 verdict task 2 / the
standing r12 task-8 ritual): time the named queries at sf0.1 in FRESH
JVMs, several interleaved rounds, and compare the fresh minima against
the two pinned records.  A mover whose fresh minimum snaps back to the
older pinned value is HOST NOISE; one that reproduces the inflated
value is a real regression and must be named with a fix.

Usage: python scripts/ab_movers.py <out.json> <query> [query ...]
Each round = one fresh SparkSession timing every query once (order
rotated per round so no query always pays first-job warmup); 3 rounds,
min per query.  Engine code for these queries did not change between
the two pinned records, so same-code fresh timing is the right probe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import __spark_entry__ as E
from xesmf_spark import release_persisted
from xesmf_spark.session import get_spark

names = %(names)r
spark = get_spark("ab_movers")
spark.sparkContext.setLogLevel("ERROR")
qs = E.queries()
out = {}
# one tiny warmup job so the first timed query doesn't pay JVM/codegen
spark.range(1000).count()
for n in names:
    # mirror bench.py timed_med: two trials, record the min — the
    # pinned records carry warm-session minima, so a single cold run
    # (parquet footers, codegen, worker spin-up) is not comparable
    trials = []
    for _ in range(2):
        release_persisted()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[n](spark, "/root/testdata/sf0.1").count()
        trials.append(time.perf_counter() - t0)
    out[n] = round(min(trials), 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    best: dict[str, float] = {}
    runs: list[dict[str, float]] = []
    for r in range(rounds):
        rot = names[r % len(names):] + names[: r % len(names)]
        code = _CHILD % {"repo": HERE, "names": rot}
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600, cwd=HERE,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"round {r} produced no result")
        got = json.loads(line[0][len("ABRESULT "):])
        runs.append(got)
        for k, v in got.items():
            best[k] = min(best.get(k, float("inf")), v)
        print(f"round {r}: {got}", file=sys.stderr)

    with open(os.path.join(HERE, "BENCH_LOCAL_r12.json")) as f:
        q12 = json.load(f)["queries"]
    with open(os.path.join(HERE, "BENCH_LOCAL_r13.json")) as f:
        q13 = json.load(f)["queries"]
    verdicts = {}
    for n in names:
        fresh, old, infl = best[n], q12.get(n), q13.get(n)
        if old is None:
            verdicts[n] = {"fresh_min": fresh, "verdict": "no r12 baseline"}
            continue
        # noise if the fresh minimum sits within 1.5x of the OLDER
        # pinned value (the pre-inflation baseline); regression if it
        # reproduces the inflated number instead
        verdicts[n] = {
            "fresh_min": fresh,
            "r12_pinned": old,
            "r13_pinned": infl,
            "fresh_vs_r12": round(fresh / old, 2),
            "verdict": "noise" if fresh <= 1.5 * old else "REGRESSION",
        }
    payload = {"rounds": runs, "minima": best, "verdicts": verdicts}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(verdicts, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
