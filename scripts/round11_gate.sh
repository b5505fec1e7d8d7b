#!/usr/bin/env bash
# Round-11 end-of-round gate: dual-SF correctness, full probe
# re-measure on the round-11 binary, final bench. Run on a QUIET
# machine; logs to round11_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "verify sf0.01 (full surface)"
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_sf001" \
  >/dev/null 2>&1 && echo "verify sf0.01 OK" || echo "VERIFY sf0.01 FAILED"

step "check sf0.01 (DuckDB oracle, full surface)"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/gate_sf001 \
  2>&1 | tail -4

step "verify sf0.1 (full surface)"
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/gate_sf01" \
  >/dev/null 2>&1 && echo "verify sf0.1 OK" || echo "VERIFY sf0.1 FAILED"

step "check sf0.1 (DuckDB oracle, full surface — slow)"
python3 scripts/check.py /root/testdata/sf0.1 /tmp/gate_sf01 \
  2>&1 | tail -4

step "probe re-measure (late-round-11 binary: Hamming-histogram plan rework + ten new probe-list queries -> old reps stale)"
rm -f benchdata/probe_sf0.1_*.json benchdata/probe_sf1_*.json \
  benchdata/unif0.1_*.json benchdata/unif1_*.json \
  benchdata/skew0.1_*.json benchdata/skew1_*.json
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "final bench sf0.1 (canary on)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1

step "shuffle reference + probe report"
cp bench_shuffle.json benchdata/shuffle_ref.json
python3 scripts/probe_report.py 2>&1 | tail -60

step "gate done"
