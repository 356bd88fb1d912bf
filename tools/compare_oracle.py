#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB correctness compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [entry ...]
Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB
against the parquet tables in <sfDir>, and compares row count, sorted
column names, and value-hash against the Spark parquet dump.
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(f"{out}/oracle_sql.json") as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if v is None:
        return "\\N"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

con = duckdb.connect()
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails += 1
        continue
    tb = pq.read_table(files[0])
    scols = list(tb.column_names)
    srows = [tuple(r.values()) for r in tb.to_pylist()]
    try:
        cur = con.execute(sql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fails += 1
        continue
    rm = len(srows) == len(orows)
    cm = sorted(scols) == sorted(ocols)
    hm = cm and table_hash(scols, srows) == table_hash(ocols, orows)
    if rm and cm and hm:
        print(f"{name}: OK ({len(srows)} rows)")
    else:
        fails += 1
        print(f"{name}: FAIL rows={len(srows)}/{len(orows)} cols={cm} hash={hm}")
        if rm and cm and not hm:
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = sorted("\x01".join(norm(r[i]) for i in so) for r in srows)
            oset = sorted("\x01".join(norm(r[i]) for i in oo) for r in orows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b]
            print(f"  {len(diffs)} differing sorted lines; first 5:")
            for a, b in diffs[:5]:
                print(f"   spark:  {a!r}")
                print(f"   oracle: {b!r}")
sys.exit(1 if fails else 0)
