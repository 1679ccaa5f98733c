#!/bin/bash
# Direct-java bench launcher (bypasses sbt's runner so env + heap are exact).
# usage: scripts/bench.sh [main-class] — env knobs per graft.Bench scaladoc.
set -e
cd "$(dirname "$0")/.."
# ABSOLUTE classpath: local-cluster executor JVMs are spawned by the
# standalone worker with their own cwd — a relative target/ path makes
# user classes resolve differently across JVMs (SerializedLambda CCEs)
CP="$(pwd)/target/scala-2.13/classes:/opt/spark/jars/*"
MAIN="${1:-graft.Bench}"
[ $# -gt 0 ] && shift
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" -XX:+UseG1GC \
  "$MAIN" "$@"
