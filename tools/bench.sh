#!/usr/bin/env bash
# Launch graft.Bench WITHOUT sbt, so the bench JSON is guaranteed to be
# the final stdout line of the process (sbt historically appended
# "[success] Total time: …" after program output, breaking the driver's
# tail-parse in rounds 1-3; build.sbt now also sets showSuccess :=
# false for the sbt path, this script removes sbt from the equation
# entirely and skips ~20 s of sbt startup per run).
#
# Usage: tools/bench.sh            # honours SPARK_GRAFT_SF_DIR,
#                                  # SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY
# Compiles via sbt (to stderr) only if classes are missing/stale.
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
# Compare against the directory's own mtime, then stamp it with the
# PRE-compile time — sbt writes class files into nested package dirs
# and never updates the top-level dir. Stamping pre-compile (not after)
# means a source saved WHILE sbt ran — and so possibly missed by that
# compilation — still reads as stale on the next run, instead of being
# silently benchmarked as already-built.
if [ ! -d "$CLASSES" ] || [ -n "$(find src/main/scala -newer "$CLASSES" -name '*.scala' -print -quit 2>/dev/null)" ]; then
  STAMP="$(mktemp)"
  sbt -batch compile 1>&2
  mkdir -p "$CLASSES"
  touch -r "$STAMP" "$CLASSES"
  rm -f "$STAMP"
fi

# Same JVM flags build.sbt passes to forked runs: Spark 4.x on JDK 17
# needs the add-opens when SparkSession is created outside spark-submit
# (mirrors org.apache.spark.launcher.JavaModuleOptions).
ADD_OPENS=()
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io \
         java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS+=(--add-opens "$p=ALL-UNNAMED")
done

exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench
