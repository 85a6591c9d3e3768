#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir] [onlyQ1,onlyQ2,...]

Assumes `graft.Verify` has already been run (scripts/check.sh does both).
With an `only` list (matching a targeted Verify run) the other queries
are not reported missing.
For each query dir under outDir: load Spark parquet + run the oracle SQL
in DuckDB over the same sf tables; compare Arrow schemas STRICTLY (the
driver hashes typed values, so a DuckDB HUGEINT/DECIMAL vs Spark BIGINT
is a driver FAIL even when the values are equal — r5 shipped exactly
that), then sort columns by name, sort rows, compare values exactly.
"""
import json, os, sys, glob
import duckdb
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def norm_type(t: pa.DataType) -> str:
    """Canonical spelling for driver-equivalent Arrow types.

    Only representation details that cannot change a typed hash are
    collapsed: timestamp unit/precision and string width. Numeric kind
    (int64 vs float64 vs decimal128) is NEVER collapsed — that is the
    exact class the driver fails on.
    """
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


fails = 0
oracle = json.load(open(f"{out}/oracle_sql.json"))
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
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
    got_at = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").arrow()
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({got_at.num_rows} rows)"); continue
    try:
        exp_at = con.execute(oracle[name]).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    g_schema = {f.name: norm_type(f.type) for f in got_at.schema}
    e_schema = {f.name: norm_type(f.type) for f in exp_at.schema}
    if sorted(g_schema) != sorted(e_schema):
        print(f"FAIL {name}: cols {sorted(g_schema)} vs {sorted(e_schema)}")
        fails += 1; continue
    dt_bad = {c: (g_schema[c], e_schema[c]) for c in g_schema
              if g_schema[c] != e_schema[c]}
    if dt_bad:
        print(f"FAIL {name}: dtype mismatch (spark vs oracle) {dt_bad}")
        fails += 1; continue
    got, exp = got_at.to_pandas(), exp_at.to_pandas()
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    # BITWISE float compare (r12): the driver's typed hash is bitwise, so
    # -0.0 vs +0.0 (value-equal under pandas check_exact) must FAIL here
    # too — r11 shipped exactly that gap (x_macd/x_elder_ray/x_williams_r).
    # View float columns as their integer bit patterns BEFORE sorting so
    # tie-breaking is bit-deterministic as well.
    import numpy as np
    def as_bits(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == np.float64:
                df[c] = df[c].to_numpy(dtype=np.float64).view(np.int64)
            elif df[c].dtype == np.float32:
                df[c] = df[c].to_numpy(dtype=np.float32).view(np.int32)
        return df
    g = as_bits(got); e = as_bits(exp)
    g = g.sort_values(list(g.columns)).reset_index(drop=True)
    e = e.sort_values(list(e.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as ae:
        print(f"FAIL {name}: value mismatch (bitwise)\n{str(ae)[:500]}")
        fails += 1
print(f"\n{total-fails}/{total} pass")
sys.exit(1 if fails else 0)
