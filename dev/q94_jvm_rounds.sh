#!/bin/bash
# q94 in-JVM order-rotated phase rounds (Probes q94jvm) — the round-9
# escalation after fresh-JVM subtraction died of between-JVM drift.
# One JVM per sf dir; the statistic is the WITHIN-round deltas.
#
# Usage: dev/q94_jvm_rounds.sh <sfDir> <warmupDir> <outJsonl> [rounds]
set -u
SFDIR=$1; WARMDIR=$2; OUT=$3; ROUNDS=${4:-5}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: >> "$OUT"
env SPARK_GRAFT_WARMUP_SF_DIR="$WARMDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=${SPARK_GRAFT_SHUFFLE_PARTITIONS:-64} \
  java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.Probes q94jvm "$SFDIR" "$ROUNDS" 2>/dev/null | grep '"probe"' >> "$OUT"
echo "[q94_jvm_rounds] DONE $SFDIR" >&2
