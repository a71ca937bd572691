#!/usr/bin/env python3
"""10x scale-rehearsal tier generator (dev tool, driver-side python).

Expands the sf0.1 driver tier M-fold (default 10) with the same
seeded-generator discipline as the driver's data: copy 0 is the original;
each further copy is a DISJOINT replica under offset keys, decorrelated so
aggregate structure scales LINEARLY (no cross-copy near-dup explosion):

  - documents: every 3rd word of copy c>0 gets a `qc<c>` suffix — with
    shingleK = 3 every word 3-gram contains a modified word, so copies
    share ZERO shingles (LSH/minhash/simhash candidates scale linearly,
    per-copy planted-duplicate structure preserved exactly) while ~2/3 of
    stopwords survive (quality keep-rules still fire).
  - embeddings: per-component multiplicative noise (1 ± 0.05u) — copies
    drop far below the 0.999 dedup threshold (near-orthogonal corpus
    stays near-orthogonal; index/em builds scale linearly).
  - events: user/event ids offset per copy (10x the key population over
    the same time range — the state-scale direction that stresses
    per-key operators like SCD2/session windows).
  - TPC-H tables: key families offset per copy consistently
    (orders+lineitem, customer, part, supplier); cents-level price
    jitter per copy so distinct-value counts grow too.
  - region/nation: unchanged (dimensions stay small at any scale —
    that is what makes them broadcastable).

Usage: python3 tools/scalegen.py [src_dir] [dst_dir] [copies]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0_synth"
M = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)

STRIDE = 10_000_000  # far above every key's max at sf0.1

KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
MONEY = {"c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
         "l_extendedprice", "value"}


def suffix_words(texts, c):
    out = []
    tag = f"qc{c}"
    for s in texts:
        if s is None:
            out.append(None)
            continue
        w = s.split(" ")
        for i in range(0, len(w), 3):
            w[i] = w[i] + tag
        out.append(" ".join(w))
    return out


def copy_of(table, t, c, rng):
    if c == 0:
        return t
    cols = {}
    for field in t.schema:
        name = field.name
        col = t.column(name)
        if name in KEYS.get(table, []):
            col = pc.add(col, pa.scalar(c * STRIDE, field.type))
        elif name in MONEY and pa.types.is_floating(field.type):
            col = pc.add(col, pa.scalar(c / 100.0, field.type))
        elif name == "text":
            col = pa.array(suffix_words(col.to_pylist(), c), type=field.type)
        elif name == "embedding":
            flat = pc.list_flatten(col.combine_chunks())
            vals = flat.to_numpy(zero_copy_only=False).astype(np.float32)
            u = rng.random(len(vals), dtype=np.float32) * 2.0 - 1.0
            noised = (vals * (1.0 + 0.05 * u)).astype(np.float32)
            offs = col.combine_chunks().offsets
            col = pa.ListArray.from_arrays(offs, pa.array(noised, type=pa.float32()))
        cols[name] = col
    t2 = pa.table(cols, schema=t.schema)
    if table == "documents":
        txt = t2.column("text")
        nc = pc.if_else(pc.is_null(txt), t2.column("n_chars"),
                        pc.utf8_length(txt).cast(pa.int64()))
        t2 = t2.set_column(t2.schema.get_field_index("n_chars"),
                           t2.schema.field("n_chars"), nc)
    return t2


for table in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
    t = pq.read_table(f"{src}/{table}.parquet")
    if table in ("region", "nation"):
        pq.write_table(t, f"{dst}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {t.num_rows} rows")
        continue
    rng = np.random.default_rng(977_000 + hash(table) % 1000)
    # stream copies as row groups so an M=100 lineitem never concatenates
    # 60M rows in memory
    with pq.ParquetWriter(f"{dst}/{table}.parquet", t.schema) as w:
        for c in range(M):
            w.write_table(copy_of(table, t, c, rng))
    print(f"{table}: {t.num_rows} -> {t.num_rows * M} rows")
print("done")
