#!/usr/bin/env bash
# Capture `graft.Explain` formatted plans for the named queries into
# per-query files: tools/explain_save.sh <outdir> <suffix> q1 q2 ...
# (suffix = "before"/"after"; files land at <outdir>/<q>_<suffix>.txt)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="$1"; SUF="$2"; shift 2
mkdir -p "$OUT"
TMP="$(mktemp /tmp/explain.XXXXXX)"
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  tools/run.sh graft.Explain "$@" 2>/dev/null > "$TMP"
python3 - "$TMP" "$OUT" "$SUF" <<'EOF'
import sys, re
tmp, out, suf = sys.argv[1], sys.argv[2], sys.argv[3]
cur, buf = None, []
def flush():
    if cur: open(f"{out}/{cur}_{suf}.txt", "w").write("".join(buf))
for line in open(tmp):
    m = re.match(r"^===== (\S+) =====$", line)
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
EOF
rm -f "$TMP"
