#!/usr/bin/env python3
"""Scale-slope audit: per-query growth across sf0.001 / sf0.01 / sf0.1.

A query whose small-SF constant hides a superlinear slope passes the
single-SF bench today and dies at 100x. This reads three Bench JSON lines
(one per scale factor), computes each query's time-growth ratio across the
largest step (sf0.01 -> sf0.1, where constants matter least), and flags
anything growing faster than the data.

Data sizes (total rows over the 8 tables Bench queries touch):
  sf0.001 ~9.9k, sf0.01 ~90k (9.1x), sf0.1 ~893k (10.0x).
Fixed per-query overhead (session, planning, scheduling ~0.2-0.5 s at
local[32]) DEFLATES the measured ratio, so ratio > DATA_RATIO is a
conservative superlinear flag: the work term grew faster than 10x even
with the constant subsidizing it.

Usage: slopes.py bench_sf0.001.json bench_sf0.01.json bench_sf0.1.json [out.md]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    p1, p2, p3 = sys.argv[1:4]
    out = sys.argv[4] if len(sys.argv) > 4 else "SLOPES.md"
    t1, t2, t3 = load(p1), load(p2), load(p3)
    data_ratio = 10.0  # sf0.01 -> sf0.1 row growth (9.97x)
    rows = []
    for q in sorted(t2):
        if q not in t3 or t2[q] <= 0 or t3[q] <= 0:
            continue
        r23 = t3[q] / t2[q]
        r12 = t2[q] / t1[q] if t1.get(q, 0) > 0 else float("nan")
        # increment slope: growth of the marginal (constant-free) work.
        # Only meaningful when both increments are positive and the first
        # is above timing noise (~50 ms).
        d21, d32 = t2[q] - t1.get(q, t2[q]), t3[q] - t2[q]
        import math
        # t1 <= 0 is Bench's every-pass-failed sentinel: d21 would be
        # inflated and the 'slope' fabricated — skip inc entirely
        inc = (math.log(d32 / d21, data_ratio)
               if t1.get(q, 0) > 0 and d21 > 0.05 and d32 > 0 else None)
        flag = "SUPERLINEAR" if r23 > data_ratio else (
            "watch" if r23 > 0.7 * data_ratio else "")
        rows.append((q, t1.get(q, float("nan")), t2[q], t3[q], r12, r23, inc, flag))
    rows.sort(key=lambda r: -r[5])
    lines = [
        "# SLOPES — per-query scale growth (round 11)",
        "",
        f"Inputs: `{p1}` / `{p2}` / `{p3}` (full Bench suite at each SF,",
        "min over passes). Data grows ~9.1x then ~10.0x per step; per-query",
        "fixed overhead deflates measured ratios, so `t(sf0.1)/t(sf0.01) >",
        "10` is a conservative superlinear flag.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | ratio 1->2 | ratio 2->3 | inc-slope | flag |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for q, a, b, c, r12, r23, inc, flag in rows:
        inc_s = f"{inc:.2f}" if inc is not None else "-"
        lines.append(
            f"| {q} | {a:.3f} | {b:.3f} | {c:.3f} | {r12:.2f} | {r23:.2f} | {inc_s} | {flag} |")
    n_super = sum(1 for r in rows if r[7] == "SUPERLINEAR")
    lines += [
        "",
        f"Flagged SUPERLINEAR: {n_super} of {len(rows)}.",
        "",
        "`inc-slope` = log_10((t3-t2)/(t2-t1)): the growth exponent of the",
        "marginal work with the fixed constant differenced out; ~1.0 is",
        "linear, shown only where the first increment clears timing noise.",
    ]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{out}: {len(rows)} queries, {n_super} superlinear")
    for q, a, b, c, r12, r23, inc, flag in rows[:12]:
        print(f"  {q:8s} {b:7.3f} -> {c:7.3f}  r23={r23:5.2f} {flag}")


if __name__ == "__main__":
    main()
