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

Usage: python3 tools/skewgen.py [src_tier] [dst_dir] [hot_share] [seed]
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

os.makedirs(dst, exist_ok=True)
t = pq.read_table(f"{src}/events.parquet")
n = t.num_rows
rng = np.random.default_rng(seed)
hot = rng.random(n) < share
user = t.column("user_id").to_numpy(zero_copy_only=False).copy()
user[hot] = 0
cols = {name: (pa.array(user) if name == "user_id" else t.column(name))
        for name in t.column_names}
pq.write_table(pa.table(cols), f"{dst}/events.parquet")
print(f"[skewgen] {n} events, user 0 now holds {hot.sum()} ({hot.mean():.1%})")

for f in os.listdir(src):
    if f.endswith(".parquet") and f != "events.parquet":
        d = f"{dst}/{f}"
        if not os.path.exists(d):
            os.link(f"{src}/{f}", d)
print(f"[skewgen] tier at {dst}")
