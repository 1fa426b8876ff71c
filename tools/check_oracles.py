#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and hash-compare (columns sorted by name,
values row-sorted). Usage: check_oracles.py <sfDir> <verifyOutDir>."""
import sys, json, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracles:
        status = "rows-only" if len(spark_df) > 0 else "EMPTY(rows-only FAIL?)"
        print(f"{name:24s} {status}  rows={len(spark_df)}")
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-SQL-ERROR: {e}")
        fail += 1
        continue

    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df.astype(str)

    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fail += 1
    elif len(a) != len(b):
        print(f"{name:24s} ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}")
        fail += 1
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        print(f"{name:24s} VALUE-MISMATCH ({diff.sum()}/{len(a)} rows differ)")
        idx = diff[diff].index[:3]
        for i in idx:
            print("   spark :", a.loc[i].to_dict())
            print("   oracle:", b.loc[i].to_dict())
        fail += 1
    else:
        print(f"{name:24s} OK rows={len(a)}")
        ok += 1
print(f"\n{ok} ok, {fail} failed, {len(oracles)} oracles")
sys.exit(1 if fail else 0)
