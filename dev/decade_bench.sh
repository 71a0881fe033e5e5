#!/bin/bash
# Paired scale-step campaign over the heavy dedup family — the round-9
# third-decade protocol. One `Probes decade` JVM per query: both scale
# dirs run ADJACENTLY inside one JVM (order rotated per round, pure-CPU
# canary before each timed run, per-run task metrics), because
# between-JVM wall subtraction is unusable on this box (±50%, PLANS
# round 9). JIT warms on <warmupDir> (one decade down) off the clock.
#
# Usage: dev/decade_bench.sh <dirA> <dirB> <warmupDir> <outJsonl> [rounds] [q1,q2,...]
#
# Round-13 note: the CC small-graph gate must be pinned OFF for decade
# runs (SPARK_GRAFT_EXTRA_CONF="spark.graft.graphDriverMaxEdges=0;...") so
# the artifact measures the DISTRIBUTED loop's constants — the scale
# path — and stays comparable with the r11/r12 decade artifacts.
#
# Disk budget: one paired round holds BOTH scales' shuffle files plus
# any local checkpoints until the probe's between-run GC lets the
# ContextCleaner reclaim them — at sf10+sf30 that peaks ~75 GB. A JVM
# that dies mid-query (ENOSPC, OOM) leaves orphaned blockmgr-*/spark-*
# dirs holding tens of GB; this harness records the failure as a JSONL
# error line (stderr kept, not discarded — two campaign JVMs died
# silently before that lesson) and sweeps orphans between queries.
# The sweep is SCOPED to this run's own spark.local.dir (a mktemp dir
# passed to every JVM) — a blanket /tmp/blockmgr-* sweep would delete
# the live shuffle files of any concurrent Spark JVM on the box
# (sbt test, a second bench session) and cause fetch failures there.
set -u
DIRA=$1; DIRB=$2; WARMDIR=$3; OUT=$4; ROUNDS=${5:-4}
QUERIES=${6:-q124_decontaminate_bloom q76_neardup_components q94_neardup_dedup}
QUERIES=${QUERIES//,/ }
RUNTMP=$(mktemp -d /tmp/graft_decade_run_XXXX)
trap 'rm -rf "$RUNTMP"' EXIT
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: > "$OUT"
for q in $QUERIES; do
  echo "=== $q ===" >&2
  ERR=$(mktemp /tmp/decade_err_XXXX.log)
  env SPARK_GRAFT_WARMUP_SF_DIR="$WARMDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=${SPARK_GRAFT_SHUFFLE_PARTITIONS:-64} \
    java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
    -Dspark.local.dir="$RUNTMP" -Djava.io.tmpdir="$RUNTMP" \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.Probes decade "$DIRA" "$DIRB" "$q" "$ROUNDS" 2>"$ERR" \
    | grep '"probe"' >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" != 0 ]; then
    why=$(grep -m1 -oE "No space left on device|OutOfMemoryError|Killed" "$ERR" || echo "exit $rc")
    echo "{\"probe\":\"decade\",\"query\":\"$q\",\"error\":\"$why\"}" >> "$OUT"
    echo "[decade_bench] $q FAILED: $why (stderr: $ERR)" >&2
  else
    rm -f "$ERR"
  fi
  # sweep shuffle orphans a dead JVM left behind before the next query —
  # only inside THIS run's local dir, never other JVMs' /tmp entries
  rm -rf "$RUNTMP"/* 2>/dev/null
done
echo DONE >> "$OUT"
echo "[decade_bench] DONE" >&2
