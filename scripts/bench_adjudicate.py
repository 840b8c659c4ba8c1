#!/usr/bin/env python3
"""Adjudicate a bench run against BASELINE.md.

Usage: python3 scripts/bench_adjudicate.py [bench_passes.json] [BASELINE.md] [--top N]

Reads the per-pass record Bench writes, takes min over passes per query,
joins BASELINE.md's measured rows, and prints the top N matched queries
(default: all) sorted by ratio with breach markers (>1.5x watch, >2x
gate). Summarizes the total-vs-total ratio over matched rows, then
reports the unmatched buckets separately: queries whose passes ALL
failed (negative times), queries with no baseline row, and baseline
rows the passes file never ran (a coverage gap, not a pass/fail state).
"""
import json, re, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
top = None
for i, a in enumerate(sys.argv):
    if a == "--top" and i + 1 < len(sys.argv):
        top = int(sys.argv[i + 1])
        args = [x for x in args if x != sys.argv[i + 1]]

passes_path = args[0] if len(args) > 0 else "bench_passes.json"
baseline_path = args[1] if len(args) > 1 else "BASELINE.md"

passes = json.load(open(passes_path))
row = re.compile(r"\|\s*(q_\w+)\s*\|\s*([0-9]+\.?[0-9]*)\s*\|")
baseline = {}
for line in open(baseline_path):
    m = row.search(line)
    if m:
        baseline[m.group(1)] = float(m.group(2))

rows = []
for q, times in passes.items():
    valid = [t for t in times if t >= 0]
    mn = min(valid) if valid else -1.0
    b = baseline.get(q)
    rows.append((q, mn, b, (mn / b) if (b and mn > 0) else None, times))

matched = [(q, mn, b, r, t) for q, mn, b, r, t in rows if r is not None]
matched.sort(key=lambda x: -x[3])
tot_mn = sum(mn for _, mn, _, _, _ in matched)
tot_b = sum(b for _, _, b, _, _ in matched)
print(f"matched {len(matched)} queries; sum(min) {tot_mn:.1f}s vs "
      f"baseline {tot_b:.1f}s = {tot_mn / tot_b:.3f}x")
over15 = [x for x in matched if x[3] > 1.5]
over20 = [x for x in matched if x[3] > 2.0]
print(f"over 1.5x: {len(over15)}   over 2x: {len(over20)}\n")
for q, mn, b, r, t in matched[: top if top else len(matched)]:
    flag = " <2x GATE>" if r > 2 else (" <1.5x>" if r > 1.5 else "")
    print(f"{q:28s} min {mn:7.3f}  base {b:7.3f}  {r:5.2f}x{flag}  "
          f"passes={[round(x, 2) for x in t]}")
all_failed = sorted(q for q, mn, b, r, t in rows if r is None and mn < 0)
no_baseline = sorted(q for q, mn, b, r, t in rows if r is None and mn >= 0)
if all_failed:
    print(f"\nALL PASSES FAILED (negative times): {all_failed}")
if no_baseline:
    print(f"\nno baseline row (record first-green): {no_baseline}")
not_run = sorted(baseline.keys() - passes.keys())
if not_run:
    print(f"\nbaseline rows not in the passes file (coverage gap): {not_run}")
