#!/usr/bin/env bash
# Round-13 closing certification on the final binary: full test
# suite, dual-SF oracle gate, one full v2 bench (fresh shuffle
# sidecar for the ref merge). Appends to round13_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "full test suite (closing binary)"
sbt -batch test 2>&1 | tail -5

step "verify sf0.01 (closing binary, full surface)"
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/close_sf001 >/dev/null 2>&1 \
  && echo OK || echo FAILED
python3 scripts/check.py /root/testdata/sf0.01 /tmp/close_sf001 \
  2>&1 | tail -2

step "verify sf0.1 (closing binary, full surface)"
SPARK_GRAFT_CPUS=32 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/close_sf01 >/dev/null 2>&1 \
  && echo OK || echo FAILED
python3 scripts/check.py /root/testdata/sf0.1 /tmp/close_sf01 \
  2>&1 | tail -2

step "full v2 bench (closing binary)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_close.json
cp bench_reps.json benchdata/bench_v2_close_reps.json
