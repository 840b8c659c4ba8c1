#!/bin/bash
# Run graft.Bench with plain java (no sbt lock), mirroring build.sbt javaOptions.
# Usage: scripts/bench.sh [extra JVM flags...]
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" "$@" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
