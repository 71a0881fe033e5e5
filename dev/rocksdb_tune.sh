#!/bin/bash
# RocksDB provider-premium tuning sweep (round-9 ask #5): the two combos
# with the worst rocksdb/hdfs per-batch premium at sf10 (q121 2.0x,
# q186 1.6x in STREAM_sf10.jsonl), re-run under the StreamBench tuning
# presets — changelog checkpointing (commit uploads a delta log instead
# of a full SST snapshot), trackTotalNumberOfRows=false (drops the
# per-put/delete count bookkeeping), and both. hdfs + untuned rocksdb
# re-run the same night as the in-protocol denominators: preset effects
# are judged against SAME-NIGHT anchors, not round-8 numbers.
#
# Usage: dev/rocksdb_tune.sh <srcSfDir> <workDir> <outJsonl> [nFiles]
set -u
SRC=$1; WORK=$2; OUT=$3; NFILES=${4:-25}
CP="$(dirname "$0")/../target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
: > "$OUT"
if [ ! -d "$WORK/files" ]; then
  $JAVA graft.StreamBench prepare "$SRC" "$WORK" "$NFILES" 2>/dev/null | grep '"prepared"' >> "$OUT"
fi
for q in q121_hll_window q186_histogram; do
  # same-night anchors first, then the presets
  for combo in "hdfs none" "rocksdb none" "rocksdb changelog" "rocksdb notrack" "rocksdb both"; do
    set -- $combo; prov=$1; preset=$2
    line=$($JAVA graft.StreamBench run "$WORK" "$q" "$prov" 1 "$preset" 2>/dev/null | grep '"stream_query"')
    if [ -z "$line" ]; then
      echo "{\"stream_query\":\"$q\",\"provider\":\"$prov\",\"preset\":\"$preset\",\"error\":\"no metric line\"}" >> "$OUT"
      echo "[rocksdb_tune] $q/$prov/$preset FAILED" >&2
    else
      echo "$line" >> "$OUT"
      echo "[rocksdb_tune] $q/$prov/$preset done" >&2
    fi
  done
done
echo DONE >> "$OUT"
echo "[rocksdb_tune] DONE" >&2
