#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB correctness compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [entry ...]
Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB
against the parquet tables in <sfDir>, and compares row count, sorted
column names, and value-hash against the Spark parquet dump.

r7: the oracle result is fetched via ARROW (not fetchall) to replicate
the driver's harness — DuckDB widens SUM/list_sum to HUGEINT, which
arrow materializes as decimal128 and normalizes differently than int64
(the r5/r6 red-row root cause; plain fetchall masked it). Additionally
every oracle's result schema is type-gated: any column whose DuckDB
type is outside the SAFE set (the types whose arrow/pandas/fetchall
normalizations all agree) fails the entry even when the hash matches,
so the next HUGEINT/DECIMAL leak is caught locally before the driver
sees it.
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(f"{out}/oracle_sql.json") as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB result types whose normalization is identical across
# fetchall / arrow / pandas. Anything else (HUGEINT, DECIMAL, UHUGEINT,
# intervals...) is a latent driver-hash divergence even if values match.
SAFE_DUCK_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                   "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


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


def arrow_rows(tb: pa.Table):
    return [tuple(r.values()) for r in tb.to_pylist()]


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
    srows = arrow_rows(tb)
    try:
        # DESCRIBE gives DuckDB-native type names (arrow schema would
        # already have lossily mapped HUGEINT -> decimal128).
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        otypes = {r[0]: r[1] for r in desc}
        # Arrow fetch replicates the driver's normalization path.
        otb = con.execute(sql).fetch_arrow_table()
        ocols = list(otb.column_names)
        orows = arrow_rows(otb)
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fails += 1
        continue
    bad_types = {c: t for c, t in otypes.items()
                 if t.split("(")[0] not in SAFE_DUCK_TYPES}
    rm = len(srows) == len(orows)
    cm = sorted(scols) == sorted(ocols)
    hm = cm and table_hash(scols, srows) == table_hash(ocols, orows)
    if rm and cm and hm and not bad_types:
        print(f"{name}: OK ({len(srows)} rows) "
              f"types={{{', '.join(f'{c}:{t}' for c, t in otypes.items())}}}")
    else:
        fails += 1
        print(f"{name}: FAIL rows={len(srows)}/{len(orows)} cols={cm} "
              f"hash={hm} badtypes={bad_types or '{}'}")
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
