#!/usr/bin/env bash
# Launch graft.Verify WITHOUT sbt, with the same JVM add-opens flags as
# tools/bench.sh (Spark 4.x on JDK 17 outside spark-submit; the Arrow
# batch stage additionally needs java.nio opened — a bare `java -cp`
# run silently loses m04/m05/m07/d07/d10/x09).
#
# Usage: tools/verify.sh [SF_DIR] [OUT_DIR]   # honours SPARK_GRAFT_ONLY
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"

CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ] || [ -n "$(find src/main/scala -newer "$CLASSES" -name '*.scala' -print -quit 2>/dev/null)" ]; then
  STAMP="$(mktemp)"
  sbt -batch compile 1>&2
  mkdir -p "$CLASSES"
  touch -r "$STAMP" "$CLASSES"
  rm -f "$STAMP"
fi

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
  graft.Verify "$SF_DIR" "$OUT_DIR"
