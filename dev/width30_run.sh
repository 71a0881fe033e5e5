#!/bin/bash
# Single-scale within-JVM width pairing at sf30 (Probes width) — the
# direct falsification of the q94 fixed-shuffle-width hypothesis at the
# scale where it was raised. See dev/width_bench.sh for the paired
# scale-step arms; this one holds scale fixed (one dir, one JVM) and
# alternates spark.sql.shuffle.partitions 64 vs 512 per round, so no
# between-JVM drift and no doubled shuffle footprint (ENOSPC-safe).
# Usage: dev/width30_run.sh <sfDir> <warmupDir> <outJsonl> [rounds]
set -u
SFDIR=$1; WARMDIR=$2; OUT=$3; ROUNDS=${4:-3}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUNTMP=$(mktemp -d /tmp/graft_width30_XXXX)
trap 'rm -rf "$RUNTMP"' EXIT
ERR=$(mktemp /tmp/width30_err_XXXX.log)
: > "$OUT"
env SPARK_GRAFT_WARMUP_SF_DIR="$WARMDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.autoBroadcastJoinThreshold=-1" \
  java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
  -Dspark.local.dir="$RUNTMP" -Djava.io.tmpdir="$RUNTMP" \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.Probes width "$SFDIR" q94_neardup_dedup 64 512 "$ROUNDS" 2>"$ERR" \
  | grep '"probe"' >> "$OUT"
rc=${PIPESTATUS[0]}
if [ "$rc" != 0 ]; then
  why=$(grep -m1 -oE "No space left on device|OutOfMemoryError|Killed" "$ERR" || echo "exit $rc")
  echo "{\"probe\":\"width\",\"query\":\"q94_neardup_dedup\",\"error\":\"$why\"}" >> "$OUT"
  echo "[width30] FAILED: $why (stderr: $ERR)" >&2
else
  rm -f "$ERR"
fi
echo DONE >> "$OUT"
echo "[width30] DONE" >&2
