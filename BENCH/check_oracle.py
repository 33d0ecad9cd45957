#!/usr/bin/env python3
"""Replay the driver's DuckDB oracle compare against graft.Verify output.

Usage: python3 /tmp/check_oracle.py <sfdir> <verify_out_dir> [only,names]

graft.Verify must have been run first:
  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify-out'
It writes <out>/<name>.parquet per query plus <out>/oracle_sql.json.

For each query: run the oracle SQL in DuckDB with each sf table
registered as a view over its parquet, load the spark parquet, sort
columns by name, sort rows, compare (floats to 1e-9 rel)."""
import sys, os, json, math
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    sp_path = f"{outdir}/{name}"
    if not os.path.isdir(sp_path):
        sp_path = f"{outdir}/{name}.parquet"
    try:
        odf = con.execute(sql).fetchdf()
        sdf = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{sp_path}/*.parquet')").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        schema_ok = ocols == scols
        rows_ok = len(odf) == len(sdf)
        hash_ok = False
        if schema_ok and rows_ok:
            o = odf[ocols].copy(); s = sdf[scols].copy()
            def norm(df):
                for c in df.columns:
                    if df[c].dtype == object:
                        df[c] = df[c].map(lambda v: json.dumps(v.tolist()) if hasattr(v, 'tolist') else v)
                    elif df[c].dtype.kind == 'f':
                        df[c] = df[c].round(6)
                    elif str(df[c].dtype).startswith('datetime'):
                        df[c] = df[c].astype(str)
                return df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
            o, s = norm(o), norm(s)
            hash_ok = True
            for c in o.columns:
                if o[c].dtype.kind == 'f' or s[c].dtype.kind == 'f':
                    a = o[c].astype(float); b = s[c].astype(float)
                    bad = ~((a.isna() & b.isna()) | ((a - b).abs() <= 1e-6 + 1e-6 * b.abs()))
                else:
                    a, b = o[c], s[c]
                    bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
                if bad.any():
                    hash_ok = False
                    i = bad.idxmax()
                    print(f"  {name}.{c} first mismatch row {i}: oracle={o[c][i]!r} spark={s[c][i]!r}")
                    break
        status = "MATCH" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails.append(name)
            print(f"{status} {name}: rows o={len(odf)} s={len(sdf)} schema_ok={schema_ok} "
                  f"ocols={ocols if not schema_ok else ''} scols={scols if not schema_ok else ''}")
        else:
            print(f"{status} {name} ({len(sdf)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERROR {name}: {e}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} match" + (f"; FAILS: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
