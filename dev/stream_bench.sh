#!/bin/bash
# Stateful-streaming scale sweep — one (query, provider) combo per fresh
# JVM (state-store provider caches are per-process; isolation keeps one
# combo's GC churn out of another's batch timings — the round-6 protocol).
#
# Usage: dev/stream_bench.sh <srcSfDir> <workDir> <outJsonl> [nFiles] [queries]
#   dev/stream_bench.sh /tmp/graft_sf10 /tmp/graft_streamwork /tmp/stream_sf10.jsonl 25
# Requires: sbt -batch compile beforehand (reads target/scala-2.13/classes).
set -u
SRC=$1; WORK=$2; OUT=$3; NFILES=${4:-25}; QUERIES=${5:-all}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

: > "$OUT"
$JAVA graft.StreamBench prepare "$SRC" "$WORK" "$NFILES" 2>/dev/null | grep '"prepared"' >> "$OUT"

if [ "$QUERIES" = all ]; then
  QLIST="q33_tumbling q51_sessions q159_dedup q121_hll_window q186_histogram q70_interval_join q133_outer_join q157_semi_join q160_full_outer_join"
else
  QLIST=$(echo "$QUERIES" | tr ',' ' ')
fi

for q in $QLIST; do
  for prov in hdfs rocksdb; do
    line=$($JAVA graft.StreamBench run "$WORK" "$q" "$prov" 1 2>/dev/null | grep '"stream_query"')
    if [ -z "$line" ]; then
      echo "{\"stream_query\":\"$q\",\"provider\":\"$prov\",\"error\":\"no metric line (JVM failed or query crashed)\"}" >> "$OUT"
      echo "[stream_bench] $q/$prov FAILED" >&2
    else
      echo "$line" >> "$OUT"
      echo "[stream_bench] $q/$prov done" >&2
    fi
  done
done
echo DONE >> "$OUT"
