#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB against the sf parquet tables and compare with the Spark
result parquet written by graft.Verify. Columns sorted by name; rows sorted;
values compared exactly (floats bit-compared, with a reported max-abs-diff
fallback so near-misses are visible while iterating).

Env knobs:
- CHECK_ORACLE_JSON=path       write the per-gate result dict as JSON.
- CHECK_ORACLE_ONLY=a,b,c      check only the named gates (the sf1 sweep
                               dumps a subset of gates; without this the
                               missing dirs would all FAIL).
- CHECK_ORACLE_OVERRIDES=path  JSON {gate: sql} replacing the gate's oracle
                               SQL (tools/sf1_oracle_overrides.json — the
                               blocking-replay oracles whose brute-force
                               twins are infeasible at sf1).
- CHECK_ORACLE_VALIDATE_OVERRIDES=1  at a SMALL sf, run BOTH the override
                               and the original brute-force SQL and require
                               identical result sets — the in-repo guard
                               that a typo in the override file cannot
                               silently weaken the sf1 sweep (ADVICE r15)."""
import json, sys, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
import os
only = os.environ.get("CHECK_ORACLE_ONLY")
if only:
    names = {n.strip() for n in only.split(",") if n.strip()}
    unknown = names - oracle.keys()
    if unknown:
        print(f"CHECK_ORACLE_ONLY names unknown gates: {sorted(unknown)}")
        sys.exit(2)
    oracle = {n: q for n, q in oracle.items() if n in names}
ov_path = os.environ.get("CHECK_ORACLE_OVERRIDES")
if ov_path:
    overrides = json.load(open(ov_path))
    unknown = overrides.keys() - oracle.keys()
    if unknown and not only:
        print(f"override file names unknown gates: {sorted(unknown)}")
        sys.exit(2)
    if os.environ.get("CHECK_ORACLE_VALIDATE_OVERRIDES"):
        # small-sf equivalence gate: the override (blocking-replay) oracle
        # must return exactly the brute-force oracle's result set
        for g, osql in overrides.items():
            if g not in oracle:
                continue
            a = con.execute(oracle[g]).df()
            b = con.execute(osql).df()
            ac, bc = sorted(a.columns), sorted(b.columns)
            same = (ac == bc and len(a) == len(b) and
                    a[ac].sort_values(ac).reset_index(drop=True)
                     .equals(b[bc].sort_values(bc).reset_index(drop=True)))
            if not same:
                print(f"FAIL override_validate {g}: override SQL diverges "
                      f"from brute-force oracle ({len(a)} vs {len(b)} rows)")
                sys.exit(3)
            print(f"PASS override_validate {g} ({len(a)} rows)")
    oracle.update({g: q for g, q in overrides.items() if g in oracle})
results = {}
def record(name, **kw):
    r = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None, "err": None}
    r.update(kw); results[name] = r
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); record(name, err=str(e)); fails += 1; continue
    try:
        sdf = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); record(name, err=str(e)); fails += 1; continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
        record(name, spark_rows=len(sdf), oracle_rows=len(odf)); fails += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        record(name, schema_match=True, spark_rows=len(s), oracle_rows=len(o)); fails += 1; continue
    ok, worst = True, 0.0
    # dtype gate: the driver hashes typed Python values, so int64-vs-float64
    # (e.g. a DuckDB HUGEINT sum surfacing as float64) must FAIL even though
    # Python `7949 == 7949.0` — exactly how grouping_sets_docs slipped in r1.
    # Width differences (int32 vs int64) hash identically, so compare dtype
    # *kind* ('i'/'u' vs 'f' vs object), not the exact dtype.
    def kind(dt):
        k = dt.kind
        return "int" if k in "iu" else k
    dtype_mismatch = [c for c in ocols if kind(o[c].dtype) != kind(s[c].dtype)]
    if dtype_mismatch:
        details = {c: (str(o[c].dtype), str(s[c].dtype)) for c in dtype_mismatch}
        print(f"FAIL {name}: dtype mismatch (oracle, spark): {details}"); fails += 1; continue
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for a, b in zip(ov, sv):
            if a is None and b is None: continue
            fa = isinstance(a, float) and isinstance(b, float)
            if fa and math.isnan(a) and math.isnan(b): continue
            if a != b:
                ok = False
                if fa: worst = max(worst, abs(a - b))
                else: worst = float("inf")
    if ok:
        print(f"PASS {name} ({len(o)} rows)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(s), oracle_rows=len(o))
    else:
        print(f"FAIL {name}: value mismatch, max_abs_float_diff={worst}"); fails += 1
        record(name, rows_match=True, schema_match=True,
               spark_rows=len(s), oracle_rows=len(o))
jp = os.environ.get("CHECK_ORACLE_JSON")
if jp:
    json.dump(results, open(jp, "w"), indent=2, sort_keys=True)
    print(f"wrote {jp} ({len(results)} gates)")
sys.exit(1 if fails else 0)
