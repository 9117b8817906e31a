#!/bin/bash
# Bare-java runner for graft mains (dodges the sbt lock for long probes).
# Usage: SPARK_DRIVER_MEM=32g tools/run_main.sh graft.tools.ScaleProbe leiden 22 16 32
# Mirrors build.sbt's jdk17AddOpens + javaOptions exactly.
set -e
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp "${GRAFT_CP:-target/scala-2.13/classes}:/opt/spark/jars/*" \
  "$@"
