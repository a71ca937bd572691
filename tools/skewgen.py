#!/usr/bin/env python3
"""Skewed-tier generator (round-16, VERDICT r15 #5; dev tool, driver-side
python). scalegen's tiers are uniform-ish; real event data is zipfian.
This takes a tier and rewrites events.parquet so ONE user (id 0) holds
~20% of all events (deterministic seeded reassignment; all other columns
untouched, remaining rows keep their original user). Every other table is
hard-linked unchanged.

The point: drive the window-heavy ev_* family and the user_id shuffle
join on a tier where one reducer would hold a fifth of the data, and
measure the documented mitigations (SaltedJoin / AQE skew split) against
the straggler. See tools/src/graft/tools/SkewBench.scala + SCALE.md.

Round 19 (VERDICT r18 #7): also skews the selection operators' natural
axes when "all" is passed — documents get a HOT LANGUAGE (20% of docs
forced to 'en', the DSIR target subset) and embeddings a HOT IVF CELL
(20% of vectors rewritten as noisy copies of one direction, so they all
route to a single coarse cell — pairwise cosine among them ~0.9, far
below the 0.999 dedup threshold).

Usage: python3 tools/skewgen.py [src_tier] [dst_dir] [hot_share] [seed] [events|all]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0_synth"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_skew"
share = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 20260814
mode = sys.argv[5] if len(sys.argv) > 5 else "events"

os.makedirs(dst, exist_ok=True)
rng = np.random.default_rng(seed)
skewed = {"events.parquet"}

t = pq.read_table(f"{src}/events.parquet")
n = t.num_rows
hot = rng.random(n) < share
user = t.column("user_id").to_numpy(zero_copy_only=False).copy()
user[hot] = 0
cols = {name: (pa.array(user) if name == "user_id" else t.column(name))
        for name in t.column_names}
pq.write_table(pa.table(cols), f"{dst}/events.parquet")
print(f"[skewgen] {n} events, user 0 now holds {hot.sum()} ({hot.mean():.1%})")

if mode == "all":
    # hot language: 20% of documents forced to the DSIR target subset
    td = pq.read_table(f"{src}/documents.parquet")
    nd = td.num_rows
    hotd = rng.random(nd) < share
    lang = td.column("lang").to_pandas().to_numpy(copy=True)
    lang[hotd] = "en"
    colsd = {name: (pa.array(lang) if name == "lang" else td.column(name))
             for name in td.column_names}
    pq.write_table(pa.table(colsd), f"{dst}/documents.parquet")
    print(f"[skewgen] {nd} documents, 'en' now holds "
          f"{(lang == 'en').sum()} ({(lang == 'en').mean():.1%})")

    # hot IVF cell: 20% of embeddings become noisy copies of one direction
    te = pq.read_table(f"{src}/embeddings.parquet")
    ne = te.num_rows
    emb = np.stack(te.column("embedding").to_pandas().to_numpy())
    hote = rng.random(ne) < share
    v0 = emb[0] / np.linalg.norm(emb[0])
    sigma = float(np.abs(emb).mean())
    noisy = (v0[None, :] + 0.35 * sigma * rng.standard_normal(
        (int(hote.sum()), emb.shape[1]))).astype(np.float32)
    emb = emb.astype(np.float32)
    emb[hote] = noisy
    colse = {name: (pa.array(list(emb), type=te.schema.field("embedding").type)
                    if name == "embedding" else te.column(name))
             for name in te.column_names}
    pq.write_table(pa.table(colse), f"{dst}/embeddings.parquet")
    cs = emb[hote] @ v0
    print(f"[skewgen] {ne} embeddings, hot direction holds {hote.sum()} "
          f"({hote.mean():.1%}), cos-to-axis [{cs.min() / np.linalg.norm(emb[hote], axis=1).max():.2f}..]")
    skewed |= {"documents.parquet", "embeddings.parquet"}

for f in os.listdir(src):
    if f.endswith(".parquet") and f not in skewed:
        d = f"{dst}/{f}"
        if not os.path.exists(d):
            os.link(f"{src}/{f}", d)
print(f"[skewgen] tier at {dst}")
