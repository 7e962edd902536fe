#!/usr/bin/env python
"""r15 §12 closing pin: merge the closing sweep(s) taken at the
final wave-3 tree into the committed pin, re-attach the mover
adjudications pin_bench.py regenerates without, and update the
conditions. Usage: python scripts/merge_w3close_pin.py SWEEP.json ..."""

import json
import subprocess
import sys

OLD = "BENCH_LOCAL_r15_opt.json"
SWEEPS = sys.argv[1:]
W3_LINES = (
    "pipeline_containment", "pipeline_prefix_filter_pairs",
    "pipeline_ngram_jaccard", "documents_hybrid_rrf",
    "multimodal_ahash_pairs", "multimodal_ahash_dedup",
)

old = json.load(open(OLD))
old_conditions = old["conditions"]
old_audit = old["final_pin_mover_audit"]
old_verdicts = {m["line"]: m for m in old_audit["movers"]}

subprocess.run(
    [sys.executable, "scripts/pin_bench.py", OLD, OLD] + SWEEPS, check=True
)

new = json.load(open(OLD))
n_total = 16 + len(SWEEPS)
new["conditions"]["pin"] = f"min of {n_total} fresh-JVM sweeps"
new["conditions"]["closing_tree_sweeps"] = (
    "sweeps 9-12 ran at the post-fixed-point tree (ef24479), 13-14 at "
    "the substring-seed tree (2f50fde), 15-16 at the LSH-valve tree "
    f"(2cb511c), {'17' if len(SWEEPS) == 1 else '17-' + str(n_total)} "
    "at the final closing tree (post inverted-index/banded-valve "
    "wave); sweeps 1-8 predate ef24479"
)
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
for k in W3_LINES:
    o, n = old["queries"].get(k), new["queries"].get(k)
    tag = (
        "NEW-SHAPE MIN" if (o is not None and n is not None and n < o)
        else "old min stands (conservative)"
    )
    print(f"  {k}: {o} -> {n}  [{tag}]")
print(f"movers: {len(kept)} kept with verdicts, {len(dropped)} dropped, "
      f"{len(fresh)} NEW (need adjudication): {fresh}")
