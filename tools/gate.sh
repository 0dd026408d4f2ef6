#!/usr/bin/env bash
# Round-close correctness gate: run the Verify dump TWICE — at two
# shuffle-partition settings (4 and 32) — and oracle-check both dumps.
#
# Why twice: a query whose RESULT depends on partition count or partition
# concatenation order (float sum order, unsorted limit, nondeterministic
# tie-break) can pass a single-setting run and then flip red on the
# driver's machine. Both r8 escapes were this family (unigram_ppl/dsir
# order sensitivity, the bloom_prune_join red row); a 2-setting gate
# catches them before the driver does (VERDICT r08 item 5).
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
for c in 4 32; do
  echo "== gate pass: SPARK_GRAFT_CPUS=$c =="
  SPARK_GRAFT_CPUS=$c sbt -batch "runMain graft.Verify $SF $OUT.c$c $QS" \
    > "$OUT.c$c.log" 2>&1 \
    || { echo "verify FAILED (cpus=$c) — tail of $OUT.c$c.log:"; \
         tail -20 "$OUT.c$c.log"; exit 1; }
  python3 tools/check.py "$SF" "$OUT.c$c" $QS 2>/dev/null | tail -3
done
echo "== gate green at both settings =="
