#!/usr/bin/env python3
"""Second-seed oracle-robustness generator (dev tool, driver-side python).

Reads a driver testdata tier and writes a deterministically PERTURBED copy
(different row order, shifted keys, jittered values, edited texts,
noised embeddings) so the whole Verify + DuckDB parity gate can be re-run
on data the oracles have never seen. Any query that memorizes planted
seed-42 structure instead of COMPUTING it fails on the perturbed tier;
a computing oracle passes trivially because Spark and DuckDB both see the
same perturbed files.

Perturbations (all driven by one fixed RNG seed, so the tier itself is
reproducible):
  - every table: deterministic row permutation
  - consistent key renumbering per key family (custkey/orderkey/partkey/
    suppkey/doc_id/vec_id/user_id/event_id) — FK joins stay intact, but
    any oracle that hard-codes seed-42 id arithmetic breaks
  - money/quantity columns: cents-level additive jitter
  - timestamps: +[0, 997) second jitter, one-sided forward
    (orderdate/shipdate/events.ts) — preserves non-negative intervals
  - documents.text: ~15%% of docs get a deterministic token appended or
    prepended (near-dup/similarity structure must be recomputed, not
    remembered)
  - embeddings: per-vector multiplicative noise (1 ± 1e-3 u)

Usage: python3 tools/perturb.py [src_sf_dir] [dst_dir] [seed]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01_seed2"
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20260814

import os
os.makedirs(dst, exist_ok=True)

KEY_OFFSETS = {
    "c_custkey": 101, "o_custkey": 101,
    "o_orderkey": 211, "l_orderkey": 211,
    "p_partkey": 53, "l_partkey": 53,
    "s_suppkey": 37, "l_suppkey": 37,
    "doc_id": 1009,
    "vec_id": 509,
    "user_id": 307,
    "event_id": 1013,
}

MONEY_JITTER = {"c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
                "l_extendedprice", "value"}
TS_JITTER = {"o_orderdate", "l_shipdate", "ts"}

rng = np.random.default_rng(seed)


def perturb(table: str) -> pa.Table:
    t = pq.read_table(f"{src}/{table}.parquet")
    n = t.num_rows
    cols = {}
    for field in t.schema:
        name = field.name
        col = t.column(name)
        if name in KEY_OFFSETS:
            col = pc.add(col, pa.scalar(KEY_OFFSETS[name], field.type))
        elif name in MONEY_JITTER and pa.types.is_floating(field.type):
            # cents-level additive noise, exact in float64 (k/100 with k<100)
            k = rng.integers(0, 100, size=n)
            col = pc.add(col, pa.array(k / 100.0, type=field.type))
        elif name in TS_JITTER and pa.types.is_timestamp(field.type):
            secs = rng.integers(0, 997, size=n)
            unit = field.type.unit
            mult = {"s": 1, "ms": 1000, "us": 1000000, "ns": 1000000000}[unit]
            col = pa.Array.from_pandas(
                (col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
                 + secs * mult)).cast(pa.int64()).cast(field.type)
        elif name == "text":
            texts = col.to_pylist()
            which = rng.random(n)
            marks = rng.integers(0, 9999, size=n)
            out = []
            for i, s in enumerate(texts):
                if s is None:
                    out.append(None)
                elif which[i] < 0.10:
                    out.append(s + f" zq{marks[i]}")
                elif which[i] < 0.15:
                    out.append(f"zq{marks[i]} " + s)
                else:
                    out.append(s)
            col = pa.array(out, type=field.type)
        elif name == "n_chars":
            # keep the stored length column consistent with the edited text
            # (recomputed after the loop; placeholder here)
            col = col
        elif name == "embedding":
            lists = col.to_pylist()
            out = []
            for v in lists:
                if v is None:
                    out.append(None)
                else:
                    u = rng.random(len(v)) * 2.0 - 1.0
                    out.append((np.asarray(v, dtype=np.float32)
                                * (1.0 + 1e-3 * u).astype(np.float32)).tolist())
            col = pa.array(out, type=field.type)
        cols[name] = col
    t2 = pa.table(cols, schema=t.schema)
    if table == "documents":
        # n_chars mirrors len(text) in the driver tier; keep that invariant
        txt = t2.column("text")
        nc = pc.if_else(pc.is_null(txt),
                        t2.column("n_chars"),
                        pc.utf8_length(txt).cast(pa.int64()))
        t2 = t2.set_column(t2.schema.get_field_index("n_chars"),
                           t2.schema.field("n_chars"), nc)
    perm = rng.permutation(n)
    return t2.take(pa.array(perm))


for table in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    out = perturb(table)
    pq.write_table(out, f"{dst}/{table}.parquet")
    print(f"{table}: {out.num_rows} rows -> {dst}/{table}.parquet")
print("done")
