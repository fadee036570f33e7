#!/usr/bin/env python3
"""Scaling report for the sf0.1 -> sf1 sweep (VERDICT r11 item 5).

Reads two targeted-bench artifacts produced with the SAME gate list and
run count (SPARK_GRAFT_BENCH_ONLY + SPARK_GRAFT_BENCH_RUNS) at the two
scales and prints per-gate steady seconds plus the scaling factor. The
input grows 10x between the scales, so a factor near 10 is linear
scaling; well under 10 means fixed costs still dominate at sf1; well
over 10 is a super-linear red flag that needs a named cause.

Usage: python3 tools/scaling_report.py bench_sf01.json bench_sf1.json
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
print(f"{'gate':30s} {'sf0.1':>8s} {'sf1':>8s} {'x':>6s}")
for k in sorted(qa):
    if k in qb and qa[k] > 0 and qb[k] > 0:
        print(f"{k:30s} {qa[k]:8.3f} {qb[k]:8.3f} {qb[k]/qa[k]:6.2f}")
ta = sum(v for v in qa.values() if v > 0)
tb = sum(v for v in qb.values() if v > 0)
print(f"{'TOTAL':30s} {ta:8.3f} {tb:8.3f} {tb/ta:6.2f}")
