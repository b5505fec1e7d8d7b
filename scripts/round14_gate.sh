#!/usr/bin/env bash
# Round-14 end-of-round gate: dual-SF correctness, canary reference
# re-baseline on this round's binary (round-13 verdict item 5 — the
# committed ref was measured on the r12-era host), probe re-measure
# (the grown probe lists + the q16/q27 plan promotions and the JW/
# damerau kernel cuts make prior numbers stale), then TWO full v2
# benches with the round's specific acceptance bars:
#   (a) headlines agree within 5% (the v2 reproducibility bar), and
#   (b) run B shows ZERO shuffle-drift flags against a ref refreshed
#       from run A — including on q16_distinct_counts, q27_profile
#       and ann_recall_curve, the three names whose AQE bistability
#       this round's plan pins exist to kill (verdict item 1: done =
#       zero-flag telemetry means zero drift again).
# Run on a QUIET machine; logs to round14_gate.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "verify sf0.01 (full surface)"
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/gate14_sf001 \
  >/dev/null 2>&1 && echo "verify sf0.01 OK" || echo "VERIFY sf0.01 FAILED"

step "check sf0.01 (DuckDB oracle, full surface)"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/gate14_sf001 \
  2>&1 | tail -4

step "verify sf0.1 (full surface)"
SPARK_GRAFT_CPUS=32 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/gate14_sf01 \
  >/dev/null 2>&1 && echo "verify sf0.1 OK" || echo "VERIFY sf0.1 FAILED"

step "check sf0.1 (DuckDB oracle, full surface — slow)"
python3 scripts/check.py /root/testdata/sf0.1 /tmp/gate14_sf01 \
  2>&1 | tail -4

step "canary reference re-baseline (3x canary-only on this binary)"
secs=()
for rep in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_CANARY_ONLY=1 \
    scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
  secs+=("$(python3 -c \
    "import json;print(json.load(open('bench_canary.json'))['canary_sec'])")")
done
python3 - "${secs[@]}" <<'EOF'
import json, sys
runs = sorted(float(x) for x in sys.argv[1:])
ref = runs[len(runs) // 2]
spread = (runs[-1] - runs[0]) / ref
old = json.load(open("benchdata/canary_ref.json"))
out = {
    "canary_sec": round(ref, 3),
    "statistic": "median",
    "names": old["names"],
    "sf": old["sf"],
    "measured": ("round 14, median-of-5 reps on the round-14 binary; "
                 f"three canary-only runs measured medians {runs} "
                 f"(spread {spread:.1%}), ref = median of the three; "
                 f"previous (round-12-era) ref {old['canary_sec']}"),
}
json.dump(out, open("benchdata/canary_ref.json", "w"), indent=1)
print(f"canary_ref.json: {old['canary_sec']} -> {out['canary_sec']} "
      f"(runs {runs}, spread {spread:.1%})")
EOF

step "probe re-measure (round-14 binary, grown lists)"
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "probe report"
python3 scripts/probe_report.py 2>&1 | tail -30

step "full v2 bench, run A (3 interleaved passes, per-query medians)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runA.json
cp bench_reps.json benchdata/bench_v2_runA_reps.json
cp bench_shuffle.json benchdata/shuffle_ref.json
echo "shuffle_ref.json refreshed from run A's sidecar"

step "full v2 bench, run B (same binary — bars: <=5% headline, zero drift)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
python3 - <<'EOF'
import json
a = json.load(open('benchdata/bench_v2_runA.json'))
b = json.load(open('bench_result.json'))
va, vb = a['value'], b['value']
print(f"runA {va:.1f}s runB {vb:.1f}s  delta {abs(va-vb)/min(va,vb)*100:.1f}%"
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
print(f"shuffle drift run B vs run A: {len(flags)} flagged "
      f"of {len(set(ref) & set(cur))} (bar: 0)")
for q, rb, cb, r in flags:
    print(f"  {q}: {rb} -> {cb} bytes ({r}x)")
pinned = ['q16_distinct_counts', 'q27_profile', 'ann_recall_curve']
bad = [q for q, *_ in flags if q in pinned]
print("pinned trio drift-free" if not bad else f"PINNED TRIO STILL FLAGS: {bad}")
EOF
