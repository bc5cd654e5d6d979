#!/usr/bin/env python3
"""Combine two ScalingBench level JSON lines into the efficiency report.
Usage: scaling_report.py <levelN.json-line-file> <level4N.json-line-file>
(each file: the sbt output containing one {"metric":"scaling_level",...})
"""
import json, re, sys

def load(path):
    for line in open(path):
        m = re.search(r'\{"metric":"scaling_level".*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"no scaling_level line in {path}")

a, b = load(sys.argv[1]), load(sys.argv[2])
if a["cpus"] > b["cpus"]:
    a, b = b, a
eff = (b["turns_per_sec"] / a["turns_per_sec"]) / (b["cpus"] / a["cpus"])
print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 4),
                  "unit": "ratio", "levels": [a, b]}))
print()
print(f'| local[{a["cpus"]}] | {a["turns"]} | {a["secs"]:.1f} s | {a["turns_per_sec"]:.0f} turns/s |')
print(f'| local[{b["cpus"]}] | {b["turns"]} | {b["secs"]:.1f} s | {b["turns_per_sec"]:.0f} turns/s |')
print(f'| efficiency | (thr_{b["cpus"]} / thr_{a["cpus"]}) / {b["cpus"]//a["cpus"]} | | {eff:.3f} |')
