#!/bin/bash
# Run a ScaleReport campaign on the compiled classes directly (bypasses
# sbt's forked-JVM overhead; same flags Spark's launcher sets on JDK 17).
# Usage: SCALE_SECTIONS=<sections> tools/campaign.sh <sfDir> [outFile]
# Extra env dials (SPARK_GRAFT_*) pass straight through.
set -euo pipefail
SFDIR="$1"
OUT="${2:-/dev/stdout}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
 --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
 --add-opens=java.base/java.io=ALL-UNNAMED \
 --add-opens=java.base/java.net=ALL-UNNAMED \
 --add-opens=java.base/java.nio=ALL-UNNAMED \
 --add-opens=java.base/java.util=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens=java.base/sun.security.action=ALL-UNNAMED \
 --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java -Xmx48g -cp "$CP" $OPENS graft.ScaleReport "$SFDIR" \
  2>/tmp/campaign_$$.err | grep '"op"' > "$OUT"
