#!/usr/bin/env bash
# Round-13 end-of-round gate: dual-SF correctness, probe re-measure
# on the round-13 binary (the registered-name promotions and the
# fused tf_heavy_delta make the prior probe numbers stale), then TWO
# full v2 benches — the format-v2 acceptance bar is the two
# same-binary headlines agreeing within 5%.
# Run on a QUIET machine; logs to round13_gate.log.
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

step "probe re-measure (round-13 binary)"
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "probe report"
python3 scripts/probe_report.py 2>&1 | tail -30

step "full v2 bench, run A (3 interleaved passes, per-query medians)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runA.json
cp bench_reps.json benchdata/bench_v2_runA_reps.json

step "full v2 bench, run B (same binary — reproducibility bar: <=5%)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
python3 - <<'EOF'
import json
a = json.load(open('benchdata/bench_v2_runA.json'))
b = json.load(open('bench_result.json'))
va, vb = a['value'], b['value']
print(f"runA {va:.1f}s runB {vb:.1f}s  delta {abs(va-vb)/min(va,vb)*100:.1f}%"
      f"  (bar: 5%)")
EOF
