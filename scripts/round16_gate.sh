#!/usr/bin/env bash
# Round-16 end-of-round gate. Same shape as round 15's, with the two
# fixes that round earned baked in:
#  - the probe report runs AFTER bench run A, so its shuffle-drift
#    block compares same-SF sidecars (probe_report.py also refuses an
#    SF mismatch outright now);
#  - the paired statistic gets both runs' shuffle sidecars, so a
#    plan-identical second-run warming improvement demotes to a note
#    instead of a false-positive flag (BenchCompare four-arg form).
# Freeze any artifact a spec replays under a round-stamped name
# (benchdata/r15_* pattern) BEFORE this script overwrites the live
# bench_v2_* files.
# Run on a QUIET machine; logs to round16_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "verify sf0.01 (full surface)"
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/gate16_sf001 \
  >/dev/null 2>&1 && echo "verify sf0.01 OK" || echo "VERIFY sf0.01 FAILED"

step "check sf0.01 (DuckDB oracle, full surface)"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/gate16_sf001 \
  2>&1 | tail -4

step "verify sf0.1 (full surface)"
SPARK_GRAFT_CPUS=32 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/gate16_sf01 \
  >/dev/null 2>&1 && echo "verify sf0.1 OK" || echo "VERIFY sf0.1 FAILED"

step "check sf0.1 (DuckDB oracle, full surface — slow)"
python3 scripts/check.py /root/testdata/sf0.1 /tmp/gate16_sf01 \
  2>&1 | tail -4

step "degenerate corpus: full-surface verify + oracle on EMPTY tables"
# permanent since round 15: every query must survive the input shape
# a 100 TB deployment produces routinely (a partition pruned to
# nothing). The RELATIVE dir regression-proves the streamSrcDir
# symlink absolutization.
python3 scripts/make_empty.py /root/testdata/sf0.001 benchdata/sf0 \
  >/dev/null
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  benchdata/sf0 /tmp/gate16_sf0 >/dev/null 2>&1 \
  && echo "verify sf0 (empty corpus) OK" || echo "VERIFY sf0 FAILED"
python3 scripts/check.py benchdata/sf0 /tmp/gate16_sf0 2>&1 | tail -2

step "probe re-measure (round-16 binary)"
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "full v2 bench, run A (3 interleaved passes, per-query medians)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runA.json
cp bench_reps.json benchdata/bench_v2_runA_reps.json
cp bench_shuffle.json benchdata/shuffle_runA.json
cp bench_shuffle.json benchdata/shuffle_ref.json
echo "shuffle_ref.json refreshed from run A's sidecar"

step "probe report (after run A: drift block compares same-SF sidecars)"
python3 scripts/probe_report.py 2>&1 | tail -30

step "full v2 bench, run B (same binary, back to back)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runB.json
cp bench_reps.json benchdata/bench_v2_runB_reps.json
cp bench_shuffle.json benchdata/shuffle_runB.json

step "paired same-binary statistic A vs B with plan-identity sidecars (bar: zero flags)"
scripts/java_bench.sh graft.BenchCompare \
  benchdata/bench_v2_runA_reps.json benchdata/bench_v2_runB_reps.json \
  benchdata/shuffle_runA.json benchdata/shuffle_runB.json \
  && echo "paired statistic PASS" || echo "paired statistic FAIL"

step "shuffle drift run B vs run A (bar: 0 production-name flags)"
python3 - <<'EOF'
import json
ref = json.load(open('benchdata/shuffle_runA.json'))['queries']
cur = json.load(open('benchdata/shuffle_runB.json'))['queries']
flags = []
for q in sorted(set(ref) & set(cur)):
    rb, cb = ref[q]['shuffle_bytes'], cur[q]['shuffle_bytes']
    if rb == 0 and cb == 0:
        continue
    r = cb / rb if rb > 0 else float('inf')
    if r > 1.2 or r < 1 / 1.2:
        flags.append((q, rb, cb, round(r, 3)))
prod = [f for f in flags if not f[0].endswith('_audit')]
print(f"shuffle drift run B vs run A: {len(flags)} flagged "
      f"of {len(set(ref) & set(cur))}, {len(prod)} on production names "
      f"(bar: 0 production)")
for q, rb, cb, r in flags:
    tag = '' if q.endswith('_audit') else '  <- PRODUCTION'
    print(f"  {q}: {rb} -> {cb} bytes ({r}x){tag}")
pinned = ['q16_distinct_counts', 'q27_profile', 'ann_recall_curve',
          'dedup_jaccard', 'dedup_jaccard_prune_audit']
bad = [q for q, *_ in flags if q in pinned]
print("pinned set drift-free" if not bad else f"PINNED SET FLAGS: {bad}")
EOF
