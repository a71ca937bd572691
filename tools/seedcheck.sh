#!/usr/bin/env bash
# Second-seed oracle-robustness gate (round-15, VERDICT r14 #2).
#
# Generates a deterministically PERTURBED copy of the sf0.01 tier
# (tools/perturb.py: row order shuffled, key families renumbered, money/
# timestamp jitter, document texts edited, embeddings noised), runs the
# full graft.Verify dump on it, and compares every oracle in DuckDB with
# the same parity harness the driver uses. A query that memorizes planted
# seed-42 structure instead of computing it fails here; the committed
# suite must end "N ok, 0 fail".
#
# Round-15 catch: the literal `vec_id < k` codebook/probe selections in
# the vector family assumed the contiguous-from-0 id space and crashed on
# the renumbered tier (Pq.train / SemDedup.seedCodebook "need ids 0..k").
# All seeding is rank-based (k smallest ids) since.
#
# Usage: tools/seedcheck.sh [seed] [src-sf-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SEED="${1:-20260814}"
SRC="${2:-/root/testdata/sf0.01}"
TIER="/tmp/sf_seedcheck_$SEED"
OUT="/tmp/verify_seedcheck_$SEED"
python3 tools/perturb.py "$SRC" "$TIER" "$SEED"
tools/verify.sh "$TIER" "$OUT" "$(nproc)"
echo "--- verify errors (must be {}): ---"
cat "$OUT/errors.json"; echo
python3 tools/parity.py "$OUT" "$TIER"
