#!/bin/bash
# Fixed-shuffle-width falsification (round-10, the last `weak` from the
# round-9 verdict): does a fixed 64-partition shuffle width explain
# q94's over-3x sf30 wall? The sf10+sf30 version of this run died at
# ENOSPC twice (one paired round holds both scales' shuffle files), so
# per the verdict's prescription it runs at sf3->sf10 — the same 3.33x
# step at ~1/3 the disk. Two arms of the SAME paired in-JVM protocol
# (Probes decade: both scales adjacent in one JVM, order rotated,
# canary before each timed run):
#   arm fixed64 : SPARK_GRAFT_SHUFFLE_PARTITIONS=64  (the campaign width)
#   arm scaled512: SPARK_GRAFT_SHUFFLE_PARTITIONS=512 (width ~ data)
# Both arms pin the join-strategy regime (autoBroadcastJoinThreshold=-1)
# so broadcast->SMJ flips between scales can't contaminate the ratio —
# the round-9 lesson. If per-partition depth is the wall term, the
# fixed-64 arm's wall ratio reads above the scaled arm's and above the
# data step; if the two arms agree, the width hypothesis is falsified
# and the q94 sf30 over-bar stays attributed to instrument aging +
# bandwidth saturation alone.
#
# Usage: dev/width_bench.sh <dirSmall> <dirBig> <warmupDir> <outJsonl> [rounds]
set -u
DIRA=$1; DIRB=$2; WARMDIR=$3; OUT=$4; ROUNDS=${5:-3}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUNTMP=$(mktemp -d /tmp/graft_width_run_XXXX)
trap 'rm -rf "$RUNTMP"' EXIT
: > "$OUT"
for W in 64 512; do
  echo "=== width $W ===" >&2
  ERR=$(mktemp /tmp/width_err_XXXX.log)
  env SPARK_GRAFT_WARMUP_SF_DIR="$WARMDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=$W \
    SPARK_GRAFT_EXTRA_CONF="spark.sql.autoBroadcastJoinThreshold=-1" \
    java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
    -Dspark.local.dir="$RUNTMP" -Djava.io.tmpdir="$RUNTMP" \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.Probes decade "$DIRA" "$DIRB" q94_neardup_dedup "$ROUNDS" 2>"$ERR" \
    | grep '"probe"' | sed "s/{\"probe\"/{\"width\":$W,\"probe\"/" >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" != 0 ]; then
    why=$(grep -m1 -oE "No space left on device|OutOfMemoryError|Killed" "$ERR" || echo "exit $rc")
    echo "{\"width\":$W,\"probe\":\"decade\",\"query\":\"q94_neardup_dedup\",\"error\":\"$why\"}" >> "$OUT"
    echo "[width_bench] width $W FAILED: $why (stderr: $ERR)" >&2
  else
    rm -f "$ERR"
  fi
  rm -rf "$RUNTMP"/* 2>/dev/null
done
echo DONE >> "$OUT"
echo "[width_bench] DONE" >&2
