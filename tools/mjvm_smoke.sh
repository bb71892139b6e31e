#!/bin/bash
# Multi-JVM execution smoke (dev-only; BASELINE.md "Multi-JVM execution
# smoke"): run the driver-facing mains against --master local-cluster[2,16,
# 4096] — 2 workers, separate EXECUTOR JVMs — the one mode where broadcast
# values, codegen'd expressions, task closures, and database endpoints must
# genuinely serialize / be externally visible. Usage:
#   sbt package                      # the jar ships to executors
#   tools/mjvm_smoke.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_mjvm
#   python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_mjvm
# Optional: point the three JDBC fixture queries at a server endpoint every
# JVM can reach (a throwaway pg_ctl Postgres — see PostgresSpec.startServer):
#   SPARK_GRAFT_JDBC_URL=jdbc:postgresql://127.0.0.1:<port>/postgres \
#   SPARK_GRAFT_JDBC_USER=graft tools/mjvm_smoke.sh ...
# Fixture table names are sf-keyed (Jdbc.fixtureTable), so different scale
# factors coexist on one server; CONCURRENT smokes at the SAME sf should
# still use distinct databases (or `?currentSchema=` per process).
set -euo pipefail
cd "$(dirname "$0")/.."
# glob, not a pinned version: a build.sbt version bump must not silently
# break the smoke with "run sbt package first" while a jar exists
JARS_FOUND=(target/scala-2.13/datalake_projectspark_*.jar)
[ ${#JARS_FOUND[@]} -eq 1 ] && [ -f "${JARS_FOUND[0]}" ] || {
  echo "expected exactly one target/scala-2.13/datalake_projectspark_*.jar (found: ${JARS_FOUND[*]}); run 'sbt package' (or clean stale jars)" >&2
  exit 1
}
JAR=${JARS_FOUND[0]}
PGJAR=/root/reference/jars/postgresql-42.2.27.jar
# mirrors build.sbt's jdk17AddOpens (JDK 17 + SparkSession outside spark-submit)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=2.13   # executor launcher can't infer it outside a full distro env
export SPARK_WORKER_DIR=${SPARK_WORKER_DIR:-/tmp/spark-work}
export SPARK_GRAFT_MASTER=${SPARK_GRAFT_MASTER:-local-cluster[2,16,4096]}
CP="$JAR:/opt/spark/jars/*"
JARS="file:$PWD/$JAR"
if [ -f "$PGJAR" ] && [ -n "${SPARK_GRAFT_JDBC_URL:-}" ]; then
  CP="$JAR:$PGJAR:/opt/spark/jars/*"
  JARS="$JARS,file:$PGJAR"
fi
export SPARK_GRAFT_JARS="$JARS"
exec java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"
