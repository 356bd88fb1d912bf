#!/usr/bin/env python3
"""Re-seed BENCH_BASELINE.json from the latest archived full run
(BENCH_full_last.json). Dev tooling, driver-side python only.

Protocol (SURVEY §6): per-entry baselines are refreshed when a round's
full bench is archived — from the run's in-suite medians, EXCEPT
entries the run itself flagged, which take their isolated recheck
median (the adjudication recheck is isolated; an in-suite-seeded
baseline would false-confirm on the recheck). The __sf pseudo-entry
records the scale the numbers are comparable at.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_last.json"
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"

run = json.load(open(src))
base = {"__sf": "sf0.1"}
for k, v in sorted(run["queries"].items()):
    base[k] = round(v, 4)
# flagged entries: the isolated recheck median is the better seed
for k, (b, v, rv) in run.get("regressions", {}).items():
    if k in base and rv:
        base[k] = round(rv, 4)

with open(out, "w") as f:
    f.write("{\n")
    f.write(",\n".join(f' "{k}": {json.dumps(v)}' for k, v in base.items()))
    f.write("\n}\n")
print(f"seeded {len(base) - 1} entries from {src}")
