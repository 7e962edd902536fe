#!/usr/bin/env python
"""One-shot helper for the r15 §10 closing pin: merge the two
seed-tree closing sweeps into the committed min-of-12 pin (growing it
to min-of-14), then re-attach what pin_bench.py regenerates without —
the in-file mover adjudications (verdict + same-day control reading)
and the descriptive conditions. Run from the repo root AFTER
/tmp/bench_seedclose_{1,2}.json exist.
"""

import json
import subprocess
import sys

OLD = "BENCH_LOCAL_r15_opt.json"
SWEEPS = ["/tmp/bench_seedclose_1.json", "/tmp/bench_seedclose_2.json"]
SEED_LINES = ("documents_suffix_ranks", "documents_longest_repeats")

old = json.load(open(OLD))
old_conditions = old["conditions"]
old_audit = old["final_pin_mover_audit"]
old_verdicts = {m["line"]: m for m in old_audit["movers"]}

subprocess.run(
    [sys.executable, "scripts/pin_bench.py", OLD, OLD] + SWEEPS, check=True
)

new = json.load(open(OLD))
new["conditions"]["pin"] = "min of 14 fresh-JVM sweeps"
new["conditions"]["closing_tree_sweeps"] = (
    "sweeps 9-12 ran at the post-fixed-point tree (ef24479), sweeps "
    "13-14 at the final closing tree (post substring-seed commit "
    "2f50fde) — for the two lines that change touches "
    "(documents_suffix_ranks, documents_longest_repeats) the seed-tree "
    "sweep minima undercut every pre-seed sweep, so their pins are the "
    "shipped post-change shape; sweeps 1-8 predate ef24479"
)
# keep the other descriptive conditions verbatim
for k, v in old_conditions.items():
    if k not in ("pin", "closing_tree_sweeps"):
        new["conditions"].setdefault(k, v)

new["final_pin_mover_audit"]["control"] = old_audit["control"]
kept, dropped, fresh = [], [], []
for m in new["final_pin_mover_audit"]["movers"]:
    line = m["line"]
    if line in old_verdicts:
        m["verdict"] = old_verdicts[line]["verdict"]
        if "prechange_same_day_control" in old_verdicts[line]:
            m["prechange_same_day_control"] = old_verdicts[line][
                "prechange_same_day_control"
            ]
        kept.append(line)
    else:
        fresh.append(line)
for line in old_verdicts:
    if line not in {m["line"] for m in new["final_pin_mover_audit"]["movers"]}:
        dropped.append(line)

with open(OLD, "w") as f:
    json.dump(new, f, indent=1, sort_keys=True)

print("total:", old["value"], "->", new["value"])
for k in SEED_LINES:
    print(k, old["queries"][k], "->", new["queries"][k])
print(f"movers: {len(kept)} kept with verdicts, {len(dropped)} dropped "
      f"(fell under 1.5x), {len(fresh)} NEW (need adjudication): {fresh}")
