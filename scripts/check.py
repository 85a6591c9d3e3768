#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Assumes `graft.Verify` has already been run (scripts/check.sh does both).
For each query dir under outDir: load Spark parquet + run the oracle SQL
in DuckDB over the same sf tables; sort columns by name, sort rows,
compare values exactly.
"""
import json, os, sys, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
fails = 0
# a query that crashed in Verify writes no output dir — surface it
# instead of silently shrinking the denominator
missing = sorted(set(oracle) - set(names))
for m in missing:
    print(f"FAIL {m}: no spark output dir (Verify crashed?)"); fails += 1
total = len(names) + len(missing)
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    # exact compare (queries are built to be bit-deterministic)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as ae:
        print(f"FAIL {name}: value mismatch\n{str(ae)[:500]}"); fails += 1
print(f"\n{total-fails}/{total} pass")
sys.exit(1 if fails else 0)
