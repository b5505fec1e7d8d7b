#!/usr/bin/env bash
# Round-12 end-of-round gate: dual-SF correctness, full probe
# re-measure on the round-12 binary (directory-capable streaming
# sources make every prior stream_* probe number stale), final bench.
# Run on a QUIET machine; logs to round12_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "verify sf0.01 (full surface)"
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/gate_sf001 \
  >/dev/null 2>&1 && echo "verify sf0.01 OK" || echo "VERIFY sf0.01 FAILED"

step "check sf0.01 (DuckDB oracle, full surface)"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/gate_sf001 \
  2>&1 | tail -4

step "verify sf0.1 (full surface)"
SPARK_GRAFT_CPUS=32 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/gate_sf01 \
  >/dev/null 2>&1 && echo "verify sf0.1 OK" || echo "VERIFY sf0.1 FAILED"

step "check sf0.1 (DuckDB oracle, full surface — slow)"
python3 scripts/check.py /root/testdata/sf0.1 /tmp/gate_sf01 \
  2>&1 | tail -4

step "probe re-measure (round-12 binary)"
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "final bench sf0.1 (canary on)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1

step "shuffle reference + probe report"
cp bench_shuffle.json benchdata/shuffle_ref.json
python3 scripts/probe_report.py 2>&1 | tail -70

step "gate done"
