#!/usr/bin/env bash
# Round-15 RESUMED-SESSION closing gate: the session that resumed the
# interrupted round landed two plan-level optimizations after the
# original r15 gate ran (the indexed Jaro match phase and the q23
# histogram-cut rank selection), so every measurement artifact is
# re-derived on the final binary: full-surface oracle at both SFs and
# on the empty corpus, full probe re-measure (stale caches purged —
# they were measured on the pre-kernel binary), and a fresh quiet-host
# same-binary bench pair judged by the paired statistic.
# Run on a QUIET machine; logs to round15_resume_close.log.
set -uo pipefail
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "verify sf0.01 (full surface)"
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/close15b_sf001 \
  >/dev/null 2>&1 && echo "verify sf0.01 OK" || echo "VERIFY sf0.01 FAILED"

step "check sf0.01 (DuckDB oracle, full surface)"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/close15b_sf001 \
  2>&1 | tail -2

step "verify sf0.1 (full surface)"
SPARK_GRAFT_CPUS=32 scripts/java_bench.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/close15b_sf01 \
  >/dev/null 2>&1 && echo "verify sf0.1 OK" || echo "VERIFY sf0.1 FAILED"

step "check sf0.1 (DuckDB oracle, full surface — slow)"
python3 scripts/check.py /root/testdata/sf0.1 /tmp/close15b_sf01 \
  2>&1 | tail -2

step "degenerate corpus: full-surface verify + oracle on EMPTY tables"
python3 scripts/make_empty.py /root/testdata/sf0.001 benchdata/sf0 \
  >/dev/null
SPARK_GRAFT_CPUS=16 scripts/java_bench.sh graft.Verify \
  benchdata/sf0 /tmp/close15b_sf0 >/dev/null 2>&1 \
  && echo "verify sf0 (empty corpus) OK" || echo "VERIFY sf0 FAILED"
python3 scripts/check.py benchdata/sf0 /tmp/close15b_sf0 2>&1 | tail -2

step "purge probe caches measured on the pre-kernel binary"
rm -f benchdata/probe_sf0.1_*.json benchdata/probe_sf1_*.json \
  benchdata/unif0.1_*.json benchdata/unif1_*.json \
  benchdata/skew0.1_*.json benchdata/skew1_*.json
echo purged

step "scale probe re-measure (final binary)"
bash scripts/scale_probe.sh 2>&1 | grep -E "^==|done"

step "skew probe re-measure (final binary)"
bash scripts/skew_probe.sh 2>&1 | grep -E "^==|done"

step "full v2 bench, run E (quiet host, final binary)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runE.json
cp bench_reps.json benchdata/bench_v2_runE_reps.json
cp bench_shuffle.json benchdata/shuffle_runE.json

step "probe report (same-SF sidecars: runs right after the sf0.1 bench)"
python3 scripts/probe_report.py 2>&1 | tail -8

step "full v2 bench, run F (same binary, back to back)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  scripts/java_bench.sh graft.Bench 2>/dev/null | tail -1
cp bench_result.json benchdata/bench_v2_runF.json
cp bench_reps.json benchdata/bench_v2_runF_reps.json
cp bench_shuffle.json benchdata/shuffle_runF.json

step "paired same-binary statistic E vs F (bar: zero flags)"
scripts/java_bench.sh graft.BenchCompare \
  benchdata/bench_v2_runE_reps.json benchdata/bench_v2_runF_reps.json \
  benchdata/shuffle_runE.json benchdata/shuffle_runF.json \
  && echo "paired statistic PASS" || echo "paired statistic FAIL"

step "shuffle drift run F vs run E (bar: 0 flags on production names)"
python3 - <<'PYEOF'
import json
ref = json.load(open('benchdata/shuffle_runE.json'))['queries']
cur = json.load(open('benchdata/shuffle_runF.json'))['queries']
flags = []
for q in sorted(set(ref) & set(cur)):
    rb, cb = ref[q]['shuffle_bytes'], cur[q]['shuffle_bytes']
    if rb == 0 and cb == 0:
        continue
    r = cb / rb if rb > 0 else float('inf')
    if r > 1.2 or r < 1 / 1.2:
        flags.append((q, rb, cb, round(r, 3)))
print(f"shuffle drift run F vs run E: {len(flags)} flagged "
      f"of {len(set(ref) & set(cur))} (bar: 0 on production names)")
for q, rb, cb, r in flags:
    print(f"  {q}: {rb} -> {cb} bytes ({r}x)")
pinned = ['q16_distinct_counts', 'q27_profile', 'ann_recall_curve',
          'dedup_jaccard', 'dedup_jaccard_prune_audit',
          'q23_percentiles', 'dedup_sorted_neighborhood',
          'dedup_sn_multipass']
bad = [q for q, *_ in flags if q in pinned]
print("pinned set drift-free" if not bad else f"PINNED SET FLAGS: {bad}")
PYEOF

step "shuffle drift run E vs the r15-gate reference (EXPECTED: the two
restructured queries move; everything else byte-stable)"
python3 - <<'PYEOF'
import json
ref = json.load(open('benchdata/r15_shuffle_runD.json'))['queries']
cur = json.load(open('benchdata/shuffle_runE.json'))['queries']
flags = []
for q in sorted(set(ref) & set(cur)):
    rb, cb = ref[q]['shuffle_bytes'], cur[q]['shuffle_bytes']
    if rb == 0 and cb == 0:
        continue
    r = cb / rb if rb > 0 else float('inf')
    if r > 1.2 or r < 1 / 1.2:
        flags.append((q, rb, cb, round(r, 3)))
print(f"shuffle drift vs r15 gate: {len(flags)} flagged")
for q, rb, cb, r in flags:
    print(f"  {q}: {rb} -> {cb} bytes ({r}x)")
expected = {'q23_percentiles'}
audit_ok = {'q16_distinct_counts_audit', 'q27_profile_audit'}
unexpected = [q for q, *_ in flags if q not in expected | audit_ok]
print("only expected/audit movement" if not unexpected
      else f"UNEXPECTED DRIFT: {unexpected}")
PYEOF

echo
echo "== closing headline =="
python3 - <<'PYEOF'
import json
e = json.load(open('benchdata/bench_v2_runE.json'))
f = json.load(open('benchdata/bench_v2_runF.json'))
print(f"run E: {e['value']} s over {len(e['queries'])} queries, "
      f"canary {e.get('canary_ratio')}")
print(f"run F: {f['value']} s over {len(f['queries'])} queries, "
      f"canary {f.get('canary_ratio')}")
PYEOF
