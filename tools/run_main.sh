#!/bin/bash
# Run a graft main class directly against compiled classes (fast path that
# skips sbt JVM spin-up). Usage: tools/run_main.sh graft.Verify <args...>
set -e
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_LIB=$(ls "$HOME"/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13*/scala-library-2.13*.jar 2>/dev/null | head -1)
exec java $ADDOPENS -Xms${SPARK_DRIVER_MEM:-8g} -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*${SCALA_LIB:+:$SCALA_LIB}" "$@"
