#!/usr/bin/env bash
# Round-close correctness gate: run the Verify dump TWICE — at two
# shuffle-partition settings (4 and 32) — oracle-check both dumps, then
# cross-compare the two dumps row-for-row.
#
# Why twice: a query whose RESULT depends on partition count or partition
# concatenation order (float sum order, unsorted limit, nondeterministic
# tie-break) can pass a single-setting run and then flip red on the
# driver's machine. Both r8 escapes were this family (unigram_ppl/dsir
# order sensitivity, the bloom_prune_join red row); a 2-setting gate
# catches them before the driver does (VERDICT r08 item 5).
#
# Why the cross-compare: each setting's oracle check sorts rows before
# comparing, so two dumps can BOTH match the oracle while still differing
# from each other in order or in cells the sorted compare ties away. The
# dump-vs-dump compare (tools/crosscheck.py, order-preserving) is the
# strictly stronger local signal for driver-side divergence (VERDICT r09
# item 5).
#
# Usage: tools/gate.sh [sfDir] [outPrefix] [query ...]
#   defaults: sfDir=/root/testdata/sf0.01 outPrefix=/tmp/gate
#   with query names, gates only those (fast single-query iteration).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/gate}"
[ $# -ge 1 ] && shift
[ $# -ge 1 ] && shift
QS="$*"
fail=0
for c in 4 32; do
  echo "== gate pass: SPARK_GRAFT_CPUS=$c =="
  SPARK_GRAFT_CPUS=$c sbt -batch "runMain graft.Verify $SF $OUT.c$c $QS" \
    > "$OUT.c$c.log" 2>&1 \
    || { echo "verify FAILED (cpus=$c) — tail of $OUT.c$c.log:"; \
         tail -20 "$OUT.c$c.log"; exit 1; }
  # No stderr discard, no tail: an oracle mismatch (or a broken duckdb
  # install) must print its full FAIL lines and flip the gate red, not
  # vanish into a truncated pipe (ADVICE r09 gate.sh item).
  if python3 tools/check.py "$SF" "$OUT.c$c" $QS; then
    echo "-- oracle check green at cpus=$c"
  else
    echo "!! gate FAILED: oracle mismatch at SPARK_GRAFT_CPUS=$c (see FAIL lines above)"
    fail=1
  fi
done
echo "== cross-setting dump compare (c4 vs c32) =="
if python3 tools/crosscheck.py "$OUT.c4" "$OUT.c32" $QS; then
  echo "-- dumps identical across settings"
else
  echo "!! gate FAILED: c4 and c32 dumps differ (order/partition sensitivity)"
  fail=1
fi
[ "$fail" -eq 0 ] && echo "== gate green at both settings ==" \
  || { echo "== gate RED =="; exit 1; }
