#!/usr/bin/env python3
"""Decoupled graph_communities parity check (dev tool, driver-side python).

Round 19 (VERDICT r18 #2): the full-operator oracle embeds the kNN
construction as SQL, which DuckDB cannot finish at the 100x tier — so
tools/LpaParity.scala materializes the kNN edge frame to parquet once and
runs the Spark LPA + report stage from it; this script runs the LPA-only
oracle SQL (dumped beside it) in DuckDB over the SAME parquet and compares
exactly like tools/parity.py (columns sorted, rows sorted, exact values).

Usage: python3 tools/lpa_parity.py [out_dir] [sf_dir]
  out_dir: LpaParity.scala's output (knn_edges.parquet, communities.parquet,
           lpa_oracle.sql); sf_dir supplies the embeddings view for nodes.
"""
import sys
import time

import duckdb
import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lpa_parity"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

con = duckdb.connect()
con.sql(f"CREATE VIEW knn_edges AS SELECT * FROM '{out}/knn_edges.parquet/*.parquet'")
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")

sql = open(f"{out}/lpa_oracle.sql").read()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 1:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


sdf = canon(pd.read_parquet(f"{out}/communities.parquet"))
t0 = time.time()
ddf = canon(con.sql(sql).df())
duck_s = time.time() - t0

bad = []
if list(sdf.columns) != list(ddf.columns):
    bad.append(f"cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
elif len(sdf) != len(ddf):
    bad.append(f"rows spark={len(sdf)} duck={len(ddf)}")
else:
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            eq = a.equals(b.astype(a.dtype))
        except (TypeError, ValueError):
            eq = a.astype(str).equals(b.astype(str))
        if not eq:
            w = np.where(a.astype(str).values != b.astype(str).values)[0][:3]
            bad.append(f"col {c} diff rows {w.tolist()} "
                       f"spark={a.iloc[w].tolist()} duck={b.iloc[w].tolist()}")

if bad:
    print("FAIL graph_communities (lpa stage)")
    for s in bad:
        print(f"     {s}")
    sys.exit(1)
print(f"ok   graph_communities lpa stage ({len(sdf)} rows, duckdb {duck_s:.1f} s)")
