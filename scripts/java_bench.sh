#!/usr/bin/env bash
# Run a graft main class with plain `java` against the compiled
# classes + the unmanaged Spark jars — no sbt launch cost and no sbt
# build-lock, so probes can run while a dev loop compiles elsewhere.
# Usage: scripts/java_bench.sh <mainClass> [args...]
# (`sbt -batch compile` first if target/scala-2.13/classes is stale.)
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
exec java -XX:+IgnoreUnrecognizedVMOptions \
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
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
