#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture parquet tables and compare with the Verify-dumped
parquet for the same query (rows / schema / values). Dev tooling only —
the Scala library does not depend on it."""
import json, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    pq = f"{OUT_DIR}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {str(e)[:200]}"))
        continue
    got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        bad.append((name, f"COLUMNS want={list(w.columns)} got={list(g.columns)}"))
        continue
    if len(w) != len(g):
        bad.append((name, f"ROWS want={len(w)} got={len(g)}"))
        continue
    try:
        pd.testing.assert_frame_equal(w, g, check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as e:
        bad.append((name, "VALUES " + str(e).splitlines()[-1][:250]))

print(f"PASS {len(ok)}/{len(oracle)}")
for n in ok:
    print("  ok", n)
for n, msg in bad:
    print("FAIL", n, "::", msg)
sys.exit(1 if bad else 0)
