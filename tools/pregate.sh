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
# Cited-specs-exist gate (round-8 lesson: a scaladoc shipped claiming a
# test "pinned by CustomFunctionsSpec" that was never written). Every
# *Spec name mentioned anywhere in src/main must be a real test class.
MISSING=0
for spec in $(grep -rhoE '\b[A-Z][A-Za-z0-9]*Spec\b' src/main | sort -u); do
  # names DEFINED in src/main (fixture case classes etc.) are not
  # test citations
  if grep -rqE "(class|object|trait) $spec\b" src/main; then continue; fi
  if ! grep -rq "class $spec" src/test; then
    echo "PREGATE FAIL: src/main cites $spec but no such class in src/test:"
    grep -rn "\b$spec\b" src/main | head -5
    MISSING=1
  fi
done
[ "$MISSING" -eq 0 ] || exit 1
sbt -batch compile
sbt -batch test
# Plan-shape regression gate (round 11): the ScanAudit/PruneAudit/
# CodegenAudit dispositions, re-adjudicated against the committed
# expected file — a new duplicate scan / unpushed filter / sort-agg
# fallback fails the commit instead of silently eroding the sweep.
sbt -batch "runMain graft.queries.PlanAudit" | grep "plan-audit"
sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT"
python3 tools/check_oracle.py "/root/testdata/sf$SF" "$OUT" | tail -3
