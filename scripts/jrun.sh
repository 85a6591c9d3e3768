#!/bin/bash
# Run a graft main class directly on the compiled classes (no sbt lock,
# no sbt startup): scripts/jrun.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) plus the usual SPARK_GRAFT_* vars.
set -e -o pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" "$@"
