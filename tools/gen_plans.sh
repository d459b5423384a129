#!/bin/bash
# Regenerate docs/PLANS.md from live physical plans (sf0.001).
# Usage: sbt compile && tools/gen_plans.sh
cd "$(dirname "$0")/.." || exit 1
/opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --driver-class-path target/scala-2.13/classes -I tools/gen_plans.scala \
  <<< "sys.exit(0)" 2>/dev/null | grep WROTE_PLANS
