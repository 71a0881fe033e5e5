#!/bin/bash
# q94 decade attribution sweep — the round-9 #1 ask: fresh JVM per
# (rung, sample), COLD and WARM page-cache regimes as a protocol.
#
# Usage: dev/q94_phase_sweep.sh <sfDir> <warmupDir> <outJsonl> [samples]
#
# <warmupDir> is a SMALLER dir (one decade down): every sample's untimed
# JIT/codegen warmup runs the same pipeline there (seconds, ~2% of a
# heavy timed run) WITHOUT touching the measured dir's pages. Regimes:
#   warm — run order keeps <sfDir>'s pages cached (generation or the
#          preceding sample read them; warm samples run FIRST);
#   cold — evict <sfDir>'s pages (dev/evict_cache.py) before the JVM, so
#          the single timed run is the first touch of the measured dir.
# RUNS=1 per JVM; Spark-level caches cleared between runs inside the
# probe either way. Fresh JVM per (rung, regime, sample).
set -u
SFDIR=$1; WARMDIR=$2; OUT=$3; SAMPLES=${4:-3}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: >> "$OUT"
for rung in pairs cc full; do
  for regime in warm cold; do
    for s in $(seq 1 "$SAMPLES"); do
      if [ "$regime" = cold ]; then
        python3 "$(dirname "$0")/evict_cache.py" "$SFDIR" >&2
      fi
      line=$(env SPARK_GRAFT_WARMUP_SF_DIR="$WARMDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
        SPARK_GRAFT_SHUFFLE_PARTITIONS=${SPARK_GRAFT_SHUFFLE_PARTITIONS:-64} \
        SPARK_GRAFT_BENCH_RUNS=1 \
        java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$CP" \
        graft.Probes q94 "$SFDIR" "$rung" 2>/dev/null | grep '"probe"')
      if [ -z "$line" ]; then
        echo "{\"probe\":\"q94_phases\",\"sf\":\"$SFDIR\",\"rung\":\"$rung\",\"regime\":\"$regime\",\"sample\":$s,\"error\":\"no probe line\"}" >> "$OUT"
        echo "[q94_sweep] $rung/$regime sample $s FAILED" >&2
      else
        echo "${line%\}},\"regime\":\"$regime\",\"sample\":$s}" >> "$OUT"
        echo "[q94_sweep] $rung/$regime sample $s done" >&2
      fi
    done
  done
done
echo "[q94_sweep] DONE $SFDIR" >&2
