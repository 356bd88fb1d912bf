#!/usr/bin/env python3
"""Re-seed BENCH_BASELINE.json from the latest archived full run
(BENCH_full_last.json). Dev tooling, driver-side python only.

Protocol (SURVEY §6, tightened r11): per-entry baselines are refreshed
when a round's full bench is archived —
  1. from the run's in-suite lower-middle medians, EXCEPT
  2. entries the run itself flagged take their isolated recheck median
     (the adjudication recheck is isolated; an in-suite-seeded baseline
     would false-confirm on the recheck), and
  3. entries adjudicated by an explicit `graft.tools.BenchProbe`
     3-iter isolated pass take THOSE medians (pass the overrides as a
     JSON file: {"entry": seconds}). This is the r10-verdict rule: a
     budget-floored or contention-inflated in-suite number must never
     become a baseline — the r10 envelope baked 1-2-sample cold draws
     in and left bfs_both_depth2 carrying 3.5x slack. Seed what an
     isolated warm run measures; in-suite weather is the speed-factor
     normalization's job, not the baseline's.
The __sf pseudo-entry records the scale the numbers are comparable at.

Usage: reseed_baseline.py [run.json] [out.json] [iso_overrides.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_last.json"
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
iso = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}

run = json.load(open(src))
base = {"__sf": "sf0.1"}
for k, v in sorted(run["queries"].items()):
    base[k] = round(v, 4)
# flagged entries: the isolated recheck median is the better seed
for k, (b, v, rv) in run.get("regressions", {}).items():
    if k in base and rv:
        base[k] = round(rv, 4)
# BenchProbe-adjudicated entries win over both
for k, v in iso.items():
    if k in base:
        base[k] = round(v, 4)

with open(out, "w") as f:
    f.write("{\n")
    f.write(",\n".join(f' "{k}": {json.dumps(v)}' for k, v in base.items()))
    f.write("\n}\n")
print(f"seeded {len(base) - 1} entries from {src} (+{len(iso)} isolated overrides)")
