#!/usr/bin/env python3
"""DuckDB side of the BASELINE.md ratio (dev tool only).

Times every oracle SQL that is also in a Bench JSON (the MATCHED set) in
DuckDB with 32 threads, min-of-2 interleaved passes, and prints both
matched totals and the ratio.

Usage: python3 tools/duckbench.py <bench.json> [oracle_sql.json] [sf_dir]
"""
import sys, json, time
import duckdb

bench_path = sys.argv[1]
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

bench = json.load(open(bench_path))["queries"]
oracle = json.load(open(oracle_path))
matched = sorted(set(bench) & set(oracle))

con = duckdb.connect()
con.sql("PRAGMA threads=32")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

best = {q: float("inf") for q in matched}
for _ in range(2):  # min-of-2 interleaved passes (fixed r6 methodology)
    for q in matched:
        t0 = time.time()
        con.sql(oracle[q]).fetchall()
        best[q] = min(best[q], time.time() - t0)

duck_total = sum(best.values())
spark_total = sum(bench[q] for q in matched)
print(f"matched queries: {len(matched)}")
for q in matched:
    print(f"  {q:28s} spark {bench[q]:7.3f}  duck {best[q]:7.3f}")
print(f"spark matched total: {spark_total:.2f} s")
print(f"duckdb matched total: {duck_total:.2f} s")
print(f"ratio: {spark_total / duck_total:.3f}x")
