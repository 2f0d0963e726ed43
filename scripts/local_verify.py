#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run each oracle SQL in
DuckDB and compare to the parquet Verify.scala dumped. Mirrors the driver:
columns sorted by name, values compared in row order."""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p))
fails = 0
for name in names:
    spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:20s} rows={len(spark_df):7d}  (no oracle, rows-only)"
              + ("  EMPTY!" if len(spark_df) == 0 else ""))
        if len(spark_df) == 0: fails += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:20s} ORACLE SQL ERROR: {e}"); fails += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)] if sorted(spark_df.columns)==sorted(duck_df.columns) else None
    if d is None:
        print(f"{name:20s} COLUMN MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails += 1; continue
    if len(s) != len(d):
        print(f"{name:20s} ROWS MISMATCH spark={len(s)} duck={len(d)}"); fails += 1; continue
    ok = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            # dtype mismatch may still compare equal value-wise; note it
            pass
        eq = (sv.values == dv.values) | (pd.isna(sv.values) & pd.isna(dv.values))
        if not eq.all():
            bad = (~eq).nonzero()[0][:3]
            print(f"{name:20s} VALUE MISMATCH col={c} dtypes=({sv.dtype},{dv.dtype}) "
                  f"rows {list(bad)}: spark={list(sv.iloc[bad])} duck={list(dv.iloc[bad])}")
            ok = False; fails += 1; break
    if ok:
        dt = [f"{c}:{s[c].dtype}/{d[c].dtype}" for c in s.columns if str(s[c].dtype)!=str(d[c].dtype)]
        note = f"  dtype-diff: {dt}" if dt else ""
        print(f"{name:20s} OK rows={len(s)}{note}")
print(f"\n{'ALL GREEN' if fails==0 else f'{fails} FAILURES'} ({len(names)} queries)")
sys.exit(1 if fails else 0)
