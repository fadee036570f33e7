#!/usr/bin/env python3
"""Cross-round bench comparison, ambient-normalized by the calib probe.

Usage: python3 tools/ambient_ratio.py PRIOR.json CURRENT.json [min_sec]

Both artifacts must carry the `calib` field (graft.Bench emits it since
r17: a fixed synthetic CPU+shuffle job over generated data, timed at the
end of every sweep). For every common gate the report shows the nominal
steady ratio AND the calib-deflated ratio (nominal / (calib_cur /
calib_prior)) — the mechanical version of the hand analysis every prior
round did by comparing per-gate ratio DISTRIBUTIONS against untouched
families (r15 1.13x, r16 1.2x ambient levels). A gate whose deflated
ratio still exceeds 2x is a real suspect; a broad nominal shift that the
deflation flattens is the machine, not the code.

The calib probe sees JVM-age + ambient load (observed band 0.41-0.75 s
across r17's sweeps of different sizes), so deflation is honest only
between artifacts of comparable sweep SHAPE (full registry vs full
registry). Targeted-sweep artifacts print a warning.
"""
import json, statistics, sys

if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(2)
prior = json.load(open(sys.argv[1]))
cur = json.load(open(sys.argv[2]))
min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2

if prior.get("sf") != cur.get("sf"):
    print(f"REFUSING: sf mismatch {prior.get('sf')} vs {cur.get('sf')} - "
          "cross-scale ratios are not regressions")
    sys.exit(2)
cp, cc = prior.get("calib"), cur.get("calib")
if not cp or not cc:
    print("WARNING: calib missing from one side (pre-r17 artifact?) - "
          "reporting nominal ratios only")
    deflate = 1.0
else:
    deflate = cc / cp
    print(f"calib: prior {cp} -> current {cc}  (ambient factor {deflate:.3f})")
qp, qc = prior["queries"], cur["queries"]
common = [k for k in qc if k in qp and qp[k] > 0 and qc[k] > 0]
if not common:
    print(f"no common gates between the two artifacts "
          f"({len(qp)}/{len(qc)} each side) - nothing to compare")
    sys.exit(2)
if len(common) < min(len(qp), len(qc)) * 0.9:
    print(f"WARNING: only {len(common)} common gates of "
          f"{len(qp)}/{len(qc)} - sweep shapes differ, deflation is rough")
tp, tc = sum(qp[k] for k in common), sum(qc[k] for k in common)
print(f"common {len(common)} gates: {tp:.1f}s -> {tc:.1f}s = "
      f"{tc/tp:.3f}x nominal, {tc/tp/deflate:.3f}x deflated")
rows = sorted(((qc[k]/qp[k], k) for k in common if qp[k] >= min_sec),
              reverse=True)
ratios = [r for r, _ in rows]
if ratios:
    med = statistics.median(ratios)
    print(f"per-gate ratio (>= {min_sec}s, n={len(ratios)}): "
          f"median {med:.3f} nominal / {med/deflate:.3f} deflated")
suspects = [(r, k) for r, k in rows if r / deflate > 2.0]
print(f"deflated >2x suspects: {len(suspects)}")
for r, k in suspects:
    print(f"  {k:34s} {qp[k]:7.2f} -> {qc[k]:7.2f}  "
          f"{r:.2f}x nominal / {r/deflate:.2f}x deflated")
