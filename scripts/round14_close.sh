#!/usr/bin/env bash
# Round-14 closing certification on the final binary (the attribution
# hot-user fix landed after the mid-round gate): TWO full v2 benches
# back to back — run C refreshes shuffle_ref.json (the attribution
# replan is expected vs the gate's run A; everything else must hold),
# run D must show ZERO drift flags vs run C (the pinned-trio proof on
# the closing binary) and a <=5% headline delta. probe_summary.json is
# regenerated LAST so its shuffle_drift section compares run D's
# full-suite sf0.1 sidecar, not a probe run's filtered sf1 one.
# Appends to round14_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "full v2 bench, run C (closing binary)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_close.json
cp bench_reps.json benchdata/bench_v2_close_reps.json
python3 - <<'EOF'
import json
ref = json.load(open('benchdata/shuffle_ref.json'))['queries']
cur = json.load(open('bench_shuffle.json'))['queries']
flags = []
for q in sorted(set(ref) & set(cur)):
    rb, cb = ref[q]['shuffle_bytes'], cur[q]['shuffle_bytes']
    if rb == 0 and cb == 0:
        continue
    r = cb / rb if rb > 0 else float('inf')
    if r > 1.2 or r < 1 / 1.2:
        flags.append((q, rb, cb, round(r, 3)))
print(f"run C vs gate run A: {len(flags)} drift flags "
      f"(expected: exactly the attribution replan)")
for q, rb, cb, r in flags:
    print(f"  {q}: {rb} -> {cb} bytes ({r}x)")
EOF
cp bench_shuffle.json benchdata/shuffle_ref.json
echo "shuffle_ref.json refreshed from run C's sidecar"

step "full v2 bench, run D (same binary — bars: <=5% headline, zero drift)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
python3 - <<'EOF'
import json
c = json.load(open('benchdata/bench_v2_close.json'))
d = json.load(open('bench_result.json'))
vc, vd = c['value'], d['value']
print(f"runC {vc:.1f}s runD {vd:.1f}s  delta {abs(vc-vd)/min(vc,vd)*100:.1f}%"
      f"  (bar: 5%)")
ref = json.load(open('benchdata/shuffle_ref.json'))['queries']
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
          'ev_attribution_linear', 'ev_attribution_position']
bad = [q for q, *_ in flags if q in pinned]
print("pinned trio + attribution drift-free" if not bad
      else f"PINNED SET STILL FLAGS: {bad}")
EOF

step "probe report (against run D's full-suite sidecar)"
python3 scripts/probe_report.py 2>&1 | tail -12
