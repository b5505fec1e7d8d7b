#!/usr/bin/env bash
# Round-15 closing bench pair (runs C/D): the gate's A/B pair ran under
# a 41% mid-run canary swing (run B canary_ratio 1.41, host_comparable
# false by BenchCompare's own report) and produced one sub-second
# improved-direction flag (q0_scan). Re-measure the same-binary pair on
# a quiet host — the r14 precedent (gate pair + closing pair).
set -uo pipefail
cd "$(dirname "$0")/.."
step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "full v2 bench, run C (quiet host)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runC.json
cp bench_reps.json benchdata/bench_v2_runC_reps.json
cp bench_shuffle.json benchdata/shuffle_runC.json

step "full v2 bench, run D (same binary, back to back)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runD.json
cp bench_reps.json benchdata/bench_v2_runD_reps.json

step "paired same-binary statistic C vs D (bar: zero flags)"
cp bench_shuffle.json benchdata/shuffle_runD.json
scripts/java_bench.sh graft.BenchCompare \
  benchdata/bench_v2_runC_reps.json benchdata/bench_v2_runD_reps.json \
  benchdata/shuffle_runC.json benchdata/shuffle_runD.json \
  && echo "paired statistic PASS" || echo "paired statistic FAIL"

step "shuffle drift run D vs run C (bar: 0 flags)"
python3 - <<'PYEOF'
import json
ref = json.load(open('benchdata/shuffle_runC.json'))['queries']
cur = json.load(open('bench_shuffle.json'))['queries']
flags = []
for q in sorted(set(ref) & set(cur)):
    rb, cb = ref[q]['shuffle_bytes'], cur[q]['shuffle_bytes']
    if rb == 0 and cb == 0:
        continue
    r = cb / rb if rb > 0 else float('inf')
    if r > 1.2 or r < 1 / 1.2:
        flags.append((q, rb, cb, round(r, 3)))
print(f"shuffle drift run D vs run C: {len(flags)} flagged "
      f"of {len(set(ref) & set(cur))} (bar: 0)")
for q, rb, cb, r in flags:
    print(f"  {q}: {rb} -> {cb} bytes ({r}x)")
pinned = ['q16_distinct_counts', 'q27_profile', 'ann_recall_curve',
          'dedup_jaccard', 'dedup_jaccard_prune_audit']
bad = [q for q, *_ in flags if q in pinned]
print("pinned set drift-free" if not bad else f"PINNED SET FLAGS: {bad}")
PYEOF
