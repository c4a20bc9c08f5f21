#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: verify_local.py [sfdir] [outdir]
Reads each <outdir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <outdir>/oracle_sql.json in DuckDB against the sfdir
tables, sorts columns by name, and compares values exactly.
"""
import duckdb, sys, json, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, ok, rows_only = 0, 0, []
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
for name in names:
    got = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    msgs = []
    if list(got.columns) != list(exp.columns):
        msgs.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
    elif len(got) != len(exp):
        msgs.append(f"rows {len(got)} vs {len(exp)}")
    else:
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.equals(b):
                continue
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                msgs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
    status = "OK  " if not msgs else "FAIL"
    if msgs:
        fails += 1
    else:
        ok += 1
    print(status, name, "; ".join(msgs))
missing = set(oracle) - set(names)
for m in sorted(missing):
    print("FAIL", m, "declared in oracleSql but no result parquet")
    fails += 1
for n, r in rows_only:
    print("ROWS", n, f"{r} rows (no oracle — weaker check)")
print(f"\n{ok}/{ok + fails} oracle-checked OK; {fails} FAIL; {len(rows_only)} rows-only")
sys.exit(1 if fails else 0)
