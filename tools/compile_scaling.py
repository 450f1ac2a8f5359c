"""Aggregate BENCH/runs/*sf30* scaling runs: per-level best across runs
(+ which run), per-pair best-of efficiency and per-run same-window
efficiencies. Pure reporting — reads the archived run JSONs."""

import glob
import json
import sys

runs = {}
for p in sorted(glob.glob(sys.argv[1] if len(sys.argv) > 1 else "BENCH/runs/r4_sf30_run*.json")):
    runs[p.split("/")[-1].replace(".json", "")] = json.load(open(p))

levels = {}  # cores -> best pipeline level (+run) with best-extract tracked separately
for name, r in runs.items():
    for c, lv in r["levels"].items():
        c = int(c)
        cur = levels.get(c)
        if cur is None or lv["triples_per_sec"] > cur["triples_per_sec"]:
            # Carry the separately-tracked extract best through the
            # replacement — pipeline-best and extract-best may come from
            # different runs.
            keep = {k: cur[k] for k in ("extract_best", "extract_run")} if cur else {}
            levels[c] = {**lv, "run": name, **keep}
        if "extract_best" not in levels[c] or lv["extract_turns_per_sec"] > levels[c]["extract_best"]:
            levels[c]["extract_best"] = lv["extract_turns_per_sec"]
            levels[c]["extract_run"] = name

print("per-level best:")
for c in sorted(levels):
    lv = levels[c]
    print(f"  {c:>2} cores: pipeline {lv['sec']}s = {lv['triples_per_sec']:.0f} t/s ({lv['run']}); "
          f"extract {lv['extract_best']:.0f} turns/s ({lv['extract_run']})")

print("pairs (best-of-levels):")
for n in sorted(levels):
    if 4 * n in levels:
        lo, hi = levels[n], levels[4 * n]
        print(f"  {n}->{4*n}: pipeline {hi['triples_per_sec']/(4*lo['triples_per_sec']):.3f}  "
              f"extract {hi['extract_best']/(4*lo['extract_best']):.3f}")

print("pairs (same-window, per run):")
for name, r in runs.items():
    for p in r["pairs"]:
        print(f"  {name} {p['N']}->{p['4N']}: pipeline {p['eff_pipeline']}  "
              f"extract {p['eff_extract']}  probe_ceiling {p['eff_hw_probe']}")
