#!/usr/bin/env bash
# Commit gate: run before any milestone commit / end-of-round snapshot.
# Green means: the build compiles, the tests pass, and the full query
# surface is hash-exact against the DuckDB oracle at sf0.001 (fast) —
# pass "0.01" as $1 for the driver's real gate scale (~5 min).
#
#   tools/pregate.sh          # sf0.001, ~2 min warm
#   tools/pregate.sh 0.01     # sf0.01, the driver's grain
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-0.001}"
OUT="$(mktemp -d /tmp/pregate.XXXXXX)"
sbt -batch compile
sbt -batch test
sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT"
python3 tools/check_oracle.py "/root/testdata/sf$SF" "$OUT" | tail -3
