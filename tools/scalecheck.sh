#!/usr/bin/env bash
# Scale-tier oracle-parity gate (round-16, VERDICT r15 "Next round" #1).
#
# The r15 scale rehearsal measured TIME at the 10x/100x synthetic tiers
# (tools/scalegen.py) but correctness stayed proven only at sf0.01. This
# gate runs the full graft.Verify dump + the driver-identical DuckDB
# parity harness ON the 10x tier, so the measured scale curves and the
# hash-green oracle suite cover the SAME data — catching the
# overflow/hash-range/skew bug class that only appears at larger n (the
# class the r15 PageRank ppb-overflow fix belongs to).
#
# Usage: tools/scalecheck.sh [tier-dir] [query1,query2,...]
#   tier-dir defaults to /tmp/sf1.0_synth (generated from sf0.1 if absent)
#   an optional comma-separated query filter restricts the dump+parity —
#   used for the 100x heavy-family spot check:
#     python3 tools/scalegen.py /root/testdata/sf0.1 /tmp/sf10_synth 100
#     tools/scalecheck.sh /tmp/sf10_synth text_incr_dedup,text_simhash_lsh,...
#
# The committed suite must end "N ok, 0 fail".
set -euo pipefail
cd "$(dirname "$0")/.."
TIER="${1:-/tmp/sf1.0_synth}"
FILTER="${2:-}"
if [ ! -f "$TIER/lineitem.parquet" ]; then
  echo "[scalecheck] generating 10x tier at $TIER"
  python3 tools/scalegen.py /root/testdata/sf0.1 "$TIER" 10
fi
OUT="/tmp/verify_scale_$(basename "$TIER")"
# These five oracles are brute-force ALL-PAIRS scans (`ON a.id < b.id`) —
# the small-n losslessness checks for their efficient twins. At the 10x
# tier they are O(n^2)-infeasible BY DESIGN OF THE ORACLE (the Spark side
# completes; text_ngram_jaccard's oracle alone runs >30 min, and
# vec_cosine_pairs' ~1.25e9 64-dim dots would take days in DuckDB). They
# stay gated at sf0.01 + the perturbed seedcheck tier.
PAIR_ORACLES="text_ngram_jaccard,text_simhash_pairs,text_ssjoin,vec_cosine_pairs,vec_dedup_removal,text_lsh_eval,text_contain_join"
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
  tools/verify.sh "$TIER" "$OUT" "$(nproc)" ${FILTER:+"$FILTER"}
echo "--- verify errors (must be {}): ---"
cat "$OUT/errors.json"; echo
python3 tools/parity.py "$OUT" "$TIER" "--skip=$PAIR_ORACLES"
