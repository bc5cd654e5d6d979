#!/usr/bin/env python3
"""Combine ScalingBench level JSON lines into the efficiency report.

Usage:
  scaling_report.py <results.jsonl>            # any number of reps per level
  scaling_report.py <levelN.json> <level4N.json>

Each input line/file contains {"metric":"scaling_level",...}. With
multiple reps per cpu level, the BEST (min secs) rep per level is used —
one timed run per fresh JVM, reps interleaved across levels (BENCH.md
protocol v2).
"""
import json, re, sys

lines = []
for path in sys.argv[1:]:
    for line in open(path):
        m = re.search(r'\{"metric":"scaling_level".*\}', line)
        if m:
            lines.append(json.loads(m.group(0)))
if not lines:
    raise SystemExit("no scaling_level lines found")

by_cpu = {}
for r in lines:
    c = r["cpus"]
    if c not in by_cpu or r["secs"] < by_cpu[c]["secs"]:
        by_cpu[c] = r
if len(by_cpu) != 2:
    raise SystemExit(f"need exactly 2 cpu levels, got {sorted(by_cpu)}")

a, b = sorted(by_cpu.values(), key=lambda r: r["cpus"])
eff = (b["turns_per_sec"] / a["turns_per_sec"]) / (b["cpus"] / a["cpus"])
reps = {c: sorted(r["secs"] for r in lines if r["cpus"] == c) for c in by_cpu}
print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 4),
                  "unit": "ratio", "reps_secs": reps, "levels": [a, b]}))
print()
print(f'| local[{a["cpus"]}] | {a["turns"]} | {a["secs"]:.1f} s | {a["turns_per_sec"]:.0f} turns/s |')
print(f'| local[{b["cpus"]}] | {b["turns"]} | {b["secs"]:.1f} s | {b["turns_per_sec"]:.0f} turns/s |')
print(f'| efficiency | (thr_{b["cpus"]} / thr_{a["cpus"]}) / {b["cpus"]//a["cpus"]} | | {eff:.3f} |')
