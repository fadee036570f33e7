#!/usr/bin/env python3
"""Cold-sweep budget ledger (VERDICT r10 item 7): split a bench artifact's
total_cold into the DELIBERATE one-time builds/training (the sanctioned
build-in-cold split: index builds, model training, memoized-per-process
setup) versus everything else, so build accretion across rounds cannot
silently hide a cold regression in the non-build surface.

Usage: python3 tools/cold_budget.py [bench_last.json]
"""
import json, re, sys

path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench_last.json"
art = json.load(open(path))

# Gates whose FIRST run deliberately pays a one-time build/training cost
# (buildOnce/ensure*/memoized models). Name-pattern based so new gates in
# an existing family classify automatically; review when adding families.
BUILD_PATTERNS = [
    r"^ann_.*_indexed",        # stored ANN indexes (lsh/ivf/sq/pq/ivfpq + _incr)
    r"^ann_cluster_sample_indexed",
    r"^ann_ivf_kmeans$",       # trains per run BY DESIGN (training IS the operator)
    r"^ann_pq_topk$",          # trains codebooks per run by design
    r"^ta_bm25_(indexed|compacted|many)",
    r"^ta_hybrid_(indexed|many)",
    r"^ta_lm_(indexed|compacted)",  # buildOnce model builds incl. _incr
    r"^ta_bpe_",               # shared one-shot BPE training
    r"^ta_textrank",           # stores the rank table once (incl. _incr)
    r"^ta_quality_classifier$",  # trains + memoizes weights
    r"^ta_clf_indexed$",       # one-time stored-model build (buildOnce)
    r"^fmt_index_manifest$",   # shares the LSH index buildOnce
    r"^dedup_cross_indexed",   # stored MinHash band index
    r"^dedup_semantic$",       # reads the stored IVF index (built once)
    r"^stream_absorb",         # stages + absorbs + ledger setup
    # r12 additions
    r"^pipeline_daily_batch$", # buildOnce of the daily band index
    r"^mm_phash_indexed",      # stored phash band+code index (incl. _incr)
    r"^pack_bpe_greedy$",      # alphabetically first payer of the shared
                               # one-shot BPE training (before ta_bpe_*)
]
build_re = re.compile("|".join(BUILD_PATTERNS))

cold, steady = art["cold"], art["queries"]
build_cold = {k: v for k, v in cold.items() if build_re.search(k) and v >= 0}
other_cold = {k: v for k, v in cold.items() if not build_re.search(k) and v >= 0}

def tot(d): return round(sum(d.values()), 1)

print(f"artifact: {path} (sf={art.get('sf')}, {len(cold)} gates)")
print(f"total_cold            : {art.get('total_cold')}")
print(f"  build/training gates: {tot(build_cold)} s over {len(build_cold)} gates")
print(f"  everything else     : {tot(other_cold)} s over {len(other_cold)} gates")
print(f"total_steady          : {art.get('value')}")
top = sorted(other_cold.items(), key=lambda kv: -kv[1])[:8]
print("top non-build cold gates (the number to watch):")
for k, v in top:
    print(f"  {k:32s} cold {v:7.2f}  steady {steady.get(k, -1):6.2f}")
