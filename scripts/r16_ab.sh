#!/usr/bin/env bash
# Round-16 A/B runner: snapshot the CURRENT classes, then run the
# filtered probe-protocol bench (minimal warm-up, single pass) from
# the frozen snapshot, 3 reps x {sf1, sf0.1}. Usage:
#   scripts/r16_ab.sh <tagprefix> <query...>
# Output: /tmp/r16_<tagprefix>_{sf1,sf0.1}_{1,2,3}.json
set -uo pipefail
cd "$(dirname "$0")/.."
TAG="$1"; shift
SNAP=/tmp/r16_classes_$TAG
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"
export SPARK_GRAFT_WARMUP_NAMES="text_stats,ev_type_stats,q0_scan,mm_meta"
export SPARK_GRAFT_CPUS=32
run_java() {
  java -XX:+IgnoreUnrecognizedVMOptions \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -cp "$SNAP:/opt/spark/jars/*" graft.Bench "$@"
}
for rep in 1 2 3; do
  for sf in /root/repo/benchdata/sf1 /root/testdata/sf0.1; do
    t=$(basename $sf)
    SPARK_GRAFT_SF_DIR=$sf run_java "$@" 2>/dev/null | tail -2 | head -1 \
      > /tmp/r16_${TAG}_${t}_${rep}.json
    echo "done $TAG $t rep $rep"
  done
done
echo ALL_DONE
