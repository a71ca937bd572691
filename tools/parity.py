#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only).

Usage: python3 tools/parity.py [verify_out_dir] [sf_dir] [--skip=a,b] [--only=a,b]
Reads <out>/oracle_sql.json + <out>/<name>/ parquet dirs produced by
`sbt "runMain graft.Verify <sf_dir> <out>"`, runs each oracle SQL in DuckDB
with views named after the tables, and compares values exactly
(columns sorted by name, rows sorted by all columns).

--skip / --only restrict the oracle set — used by tools/scalecheck.sh to
exclude the brute-force ALL-PAIRS oracles at the 10x/100x tiers (those
oracles are definitionally O(n^2); they are the small-n losslessness
checks for their efficient twins and stay gated at sf0.01).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
skip = set()
only = None
for a in sys.argv[1:]:
    if a.startswith("--skip="):
        skip.update(x for x in a[7:].split(",") if x)
    elif a.startswith("--only="):
        only = set(x for x in a[7:].split(",") if x)
out = args[0] if len(args) > 0 else "/tmp/verify_out"
sf = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting/compare works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df) > 1:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

fails = ok = skipped = 0
for name in sorted(oracle):
    if name in skip or (only is not None and name not in only):
        skipped += 1
        continue
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}")
        fails += 1
        continue
    sdf = canon(pd.read_parquet(f"{out}/{name}"))
    try:
        ddf = canon(con.sql(sql).df())
    except Exception as e:
        print(f"ORACLE ERROR {name}: {e}")
        fails += 1
        continue
    status = []
    if list(sdf.columns) != list(ddf.columns):
        status.append(f"cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
    elif len(sdf) != len(ddf):
        status.append(f"rows spark={len(sdf)} duck={len(ddf)}")
    else:
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = ((a.isna() & b.isna()) | (a.values == b.values)).all()
            else:
                try:
                    eq = a.equals(b.astype(a.dtype))
                except (TypeError, ValueError):
                    eq = a.astype(str).equals(b.astype(str))
            if not eq:
                bad = np.where(~((a.isna() & b.isna()) | (a.astype(str).values == b.astype(str).values)))[0][:3]
                status.append(f"col {c} diff rows {bad.tolist()} spark={a.iloc[bad].tolist()} duck={b.iloc[bad].tolist()}")
        # dtype check (schema parity)
        for c in sdf.columns:
            if sdf[c].dtype != ddf[c].dtype:
                status.append(f"dtype {c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
    if status:
        fails += 1
        print(f"FAIL {name}")
        for s in status:
            print(f"     {s}")
    else:
        ok += 1
        print(f"ok   {name} ({len(sdf)} rows)")

# rows-only entries (in queries but not oracle) are checked by the driver as rows>0
tail = f", {skipped} skipped" if skipped else ""
print(f"\n{ok} ok, {fails} fail{tail}")
sys.exit(1 if fails else 0)
