#!/usr/bin/env bash
# One-command definition-of-done gate: Verify -> selfcheck -> drivercheck.
#
#   tools/fullcheck.sh <sf>            e.g. tools/fullcheck.sh 0.01
#   tools/fullcheck.sh <sf> <q1,q2>    restrict to a query subset
#
# Runs graft.Verify at the given scale factor, then BOTH correctness
# emulators: selfcheck (fetchall-level, what a python-object harness sees)
# and drivercheck (pandas-level dtypes — catches DuckDB HUGEINT->float64
# renders that selfcheck cannot). A claims-ledger update (SURVEY §5) is
# only valid after this exits 0 at sf0.001, sf0.01 AND sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:?usage: tools/fullcheck.sh <sf> [query,list]}"
ONLY="${2:-}"
SFDIR="/root/testdata/sf${SF}"
OUT="/tmp/fullcheck_sf${SF}"
rm -rf "$OUT"
if [ -n "$ONLY" ]; then
  sbt -batch "runMain graft.Verify $SFDIR $OUT $ONLY" 2>&1 | grep -E '\[verify\]|error\]' | grep -v 'WARN' || true
else
  sbt -batch "runMain graft.Verify $SFDIR $OUT" 2>&1 | grep -E '\[verify\]|error\]' | grep -v 'WARN' || true
fi
echo "== selfcheck sf=${SF} =="
python3 tools/selfcheck.py "$OUT" "$SFDIR"
echo "== drivercheck sf=${SF} =="
python3 tools/drivercheck.py "$OUT" "$SFDIR"
echo "fullcheck sf=${SF}: ALL GREEN"
